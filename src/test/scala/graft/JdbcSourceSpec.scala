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
}
