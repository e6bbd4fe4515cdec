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
}
