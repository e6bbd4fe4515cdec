package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** S3 — the Postgres source path of the reference
  * (flows/main_flow.py:312-313,607,613: server-side cursor over
  * `graph.index_documents` with `itersize = db_batch_size`), as a Spark
  * JDBC reader.
  *
  * The reference's batched-cursor knobs map 1:1 onto JDBC options:
  * `itersize` → `fetchsize` (rows per round-trip), and the single
  * serial cursor becomes `numPartitions` parallel range scans on the
  * watermark column — the difference between one connection streaming
  * 100 TB and a thousand executors each reading a bounded slice.
  * Predicates on `idx`/`updated_at` push down into the remote WHERE
  * clause automatically (Catalyst JDBC pushdown), exactly like the
  * reference's hand-composed SQL.
  *
  * The harness has no live Postgres, so the Postgres-specific pieces
  * (driver class, session init) are asserted on the assembled options;
  * the READ PATH ITSELF — fetchsize, partitioned range scan, remote
  * predicate pushdown — is executed end-to-end against an embedded
  * Derby database in JdbcSourceSpec.
  */
object JdbcSource {

  /** Connection + scan configuration (credentials arrive like the
    * reference's DatabaseCredentials block — injected, never inline). */
  case class JdbcConfig(
      url: String,
      table: String,
      user: String,
      password: String,
      fetchSize: Int = 1000, // reference db_batch_size default
      driver: String = "org.postgresql.Driver",
      partitionColumn: Option[String] = Some("updated_at"),
      numPartitions: Int = 8,
      lowerBound: Option[String] = None,
      upperBound: Option[String] = None,
      // cheap per-connection session init: a read-only reporting cursor on
      // Postgres; None for engines without the statement (e.g. Derby)
      sessionInit: Option[String] = Some("SET TRANSACTION READ ONLY"))

  /** The exact option map handed to the JDBC reader — pure, testable. */
  def options(cfg: JdbcConfig): Map[String, String] = {
    val base = Map(
      "url" -> cfg.url,
      "dbtable" -> cfg.table,
      "user" -> cfg.user,
      "password" -> cfg.password,
      "driver" -> cfg.driver,
      "fetchsize" -> cfg.fetchSize.toString) ++
      cfg.sessionInit.map("sessionInitStatement" -> _)
    val part = for {
      c <- cfg.partitionColumn
      lo <- cfg.lowerBound
      hi <- cfg.upperBound
    } yield Map(
      "partitionColumn" -> c,
      "numPartitions" -> cfg.numPartitions.toString,
      "lowerBound" -> lo,
      "upperBound" -> hi)
    base ++ part.getOrElse(Map.empty)
  }

  /** Assembled reader (not yet loaded — `load()` needs a live DB). */
  def reader(spark: SparkSession, cfg: JdbcConfig): DataFrameReader =
    spark.read.format("jdbc").options(options(cfg))

  /** The envelope relation from a JDBC source: same downstream operators
    * as the parquet harness path — `Tables.envelope`-shaped columns are
    * expected from the remote table/view, exactly as the reference
    * expects them from `graph.index_documents`. */
  def envelope(spark: SparkSession, cfg: JdbcConfig): DataFrame =
    reader(spark, cfg).load()

  /** Tolerant JDBC write-back — the WRITE side of the reference's sink
    * (flows/main_flow.py:413-422: `streaming_bulk` with
    * `raise_on_error=False`, collecting per-record failures instead of
    * failing the batch), over JDBC: INSERT `df`'s rows into `cfg.table`
    * in bounded `executeBatch` chunks. A row the DATABASE rejects (a
    * constraint violation — the JDBC analog of a per-document bulk
    * error) is re-routed to `rejectTable` (same columns plus a
    * `graft_err VARCHAR` tail) instead of failing the write: the failed
    * chunk rolls back and replays row-by-row, so one poison row costs
    * one extra pass over its chunk, never a task retry. Returns the
    * number of quarantined rows.
    *
    * Scale shape: genuinely per-partition imperative work (the one
    * legitimate RDD case) — each partition opens ONE connection and
    * streams its rows through a prepared statement in `batchSize`
    * chunks under explicit transactions; nothing returns to the driver
    * but one count per partition. Executed end-to-end against embedded
    * Derby in JdbcSourceSpec (poison row quarantined, batch survives). */
  def writeTolerant(df: DataFrame, cfg: JdbcConfig, rejectTable: String,
      batchSize: Int = 100): Long = {
    val fields = df.schema.fieldNames
    val n = fields.length
    val insertSql = s"INSERT INTO ${cfg.table} (${fields.mkString(", ")})" +
      s" VALUES (${Array.fill(n)("?").mkString(", ")})"
    val rejectSql = s"INSERT INTO $rejectTable (${fields.mkString(", ")}, graft_err)" +
      s" VALUES (${Array.fill(n + 1)("?").mkString(", ")})"
    val (url, user, password, driver) = (cfg.url, cfg.user, cfg.password, cfg.driver)
    df.rdd.mapPartitions { rows =>
      if (!rows.hasNext) Iterator(0L)
      else {
        // DriverManager discovers drivers via SPI; explicit registration
        // only matters for drivers not packaged as services
        try Class.forName(driver) catch { case _: Throwable => () }
        val props = new java.util.Properties()
        props.setProperty("user", user)
        props.setProperty("password", password)
        val conn = java.sql.DriverManager.getConnection(url, props)
        var rejected = 0L
        try {
          conn.setAutoCommit(false)
          val ins = conn.prepareStatement(insertSql)
          val rej = conn.prepareStatement(rejectSql)
          def bind(ps: java.sql.PreparedStatement, r: org.apache.spark.sql.Row): Unit = {
            var i = 0
            while (i < n) { ps.setObject(i + 1, r.get(i)); i += 1 }
          }
          val buf = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](batchSize)
          def flush(): Unit = if (buf.nonEmpty) {
            try {
              buf.foreach { r => bind(ins, r); ins.addBatch() }
              ins.executeBatch()
              conn.commit()
            } catch {
              case _: java.sql.SQLException =>
                // the chunk had at least one poison row: undo any partial
                // batch effects, then replay row-by-row to isolate it
                ins.clearBatch()
                conn.rollback()
                buf.foreach { r =>
                  try { bind(ins, r); ins.executeUpdate(); conn.commit() }
                  catch {
                    case e: java.sql.SQLException =>
                      conn.rollback()
                      bind(rej, r)
                      rej.setString(n + 1, (String.valueOf(e.getSQLState) + ": " +
                        String.valueOf(e.getMessage)).take(200))
                      rej.executeUpdate()
                      conn.commit()
                      rejected += 1
                  }
                }
            }
            buf.clear()
          }
          rows.foreach { r => buf += r; if (buf.size >= batchSize) flush() }
          flush()
        } finally conn.close()
        Iterator(rejected)
      }
    }.sum().toLong
  }
}
