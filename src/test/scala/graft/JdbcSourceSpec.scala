package graft

import graft.sources.JdbcSource
import graft.sources.JdbcSource.JdbcConfig
import org.scalatest.funsuite.AnyFunSuite

/** S3 — JDBC source assembly: no live database in the harness, so the
  * contract under test is the option map the reader is built from
  * (fetchsize batching, partitioned range scan on the watermark column). */
class JdbcSourceSpec extends AnyFunSuite with SparkSpec {

  private val cfg = JdbcConfig(
    url = "jdbc:postgresql://db.example.test:5432/graph",
    table = "graph.index_documents",
    user = "reader", password = "secret",
    lowerBound = Some("2024-01-01 00:00:00"),
    upperBound = Some("2024-02-01 00:00:00"))

  test("options carry the reference's cursor batching as fetchsize") {
    val o = JdbcSource.options(cfg)
    assert(o("fetchsize") == "1000") // db_batch_size default
    assert(o("dbtable") == "graph.index_documents")
    assert(o("driver") == "org.postgresql.Driver")
  }

  test("bounded configs produce a partitioned range scan on updated_at") {
    val o = JdbcSource.options(cfg)
    assert(o("partitionColumn") == "updated_at")
    assert(o("numPartitions") == "8")
    assert(o("lowerBound") == "2024-01-01 00:00:00")
    assert(o("upperBound") == "2024-02-01 00:00:00")
  }

  test("unbounded configs fall back to a single-cursor read (no partition opts)") {
    val o = JdbcSource.options(cfg.copy(lowerBound = None, upperBound = None))
    assert(!o.contains("partitionColumn") && !o.contains("numPartitions"))
    assert(o("fetchsize") == "1000")
  }

  test("reader assembles without a live endpoint") {
    JdbcSource.reader(spark, cfg) // no load(): just the builder path
  }

  test("end-to-end: partitioned fetchsize read + remote pushdown against embedded Derby") {
    // the sandbox has no Postgres, but Derby (on Spark's classpath) runs
    // embedded — so the READ PATH itself executes: real connections, real
    // fetchsize, real per-partition range queries, real remote WHERE
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby")
      .resolve("db").toString
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE index_documents (
          |  id BIGINT NOT NULL PRIMARY KEY,
          |  idx VARCHAR(32),
          |  document VARCHAR(256),
          |  updated_at TIMESTAMP)""".stripMargin)
      val ps = conn.prepareStatement("INSERT INTO index_documents VALUES (?,?,?,?)")
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      (0 until 120).foreach { i =>
        ps.setLong(1, i.toLong)
        ps.setString(2, if (i % 3 == 0) "click" else "view")
        ps.setString(3, s"""{"k":$i}""")
        ps.setTimestamp(4, new java.sql.Timestamp(t0.getTime + i * 60000L))
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()

    val derbyCfg = JdbcConfig(
      url = url, table = "index_documents",
      user = "app", password = "app", // Derby without auth: user fixes the schema
      fetchSize = 50,
      driver = "org.apache.derby.jdbc.EmbeddedDriver",
      partitionColumn = Some("updated_at"),
      numPartitions = 4,
      lowerBound = Some("2024-01-01 00:00:00"),
      upperBound = Some("2024-01-01 02:00:00"),
      sessionInit = None) // Derby has no SET TRANSACTION READ ONLY
    val df = JdbcSource.envelope(spark, derbyCfg)
    // the range scan really split into numPartitions parallel cursors
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 120L)
    assert(df.columns.map(_.toLowerCase).toSeq ===
      Seq("id", "idx", "document", "updated_at"))
    // predicate + projection push into the remote query (Catalyst JDBC
    // pushdown — the reference's hand-composed WHERE, for free)
    val clicks = df.where(org.apache.spark.sql.functions.col("idx") === "click")
      .select("id")
    assert(clicks.queryExecution.executedPlan.toString.contains("PushedFilters"))
    assert(clicks.count() === 40L)
    // watermark range predicate (the S2 incremental shape) over JDBC
    val late = df.where(org.apache.spark.sql.functions.col("updated_at") >=
      java.sql.Timestamp.valueOf("2024-01-01 01:00:00"))
    assert(late.count() === 60L)
  }
}
