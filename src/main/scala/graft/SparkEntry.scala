package graft

import graft.operators.IndexerOps
import graft.registry._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized in packs (one per SURVEY.md §2 area); each pack
  * entry is one operator wired to the driver's parquet fixtures, with
  * DuckDB-equivalent oracle SQL where the operator is SQL-expressible.
  * Determinism rules (FIXTURES.md): results fully ordered with unique
  * non-null tiebreakers, no raw timestamp/double outputs (formatted
  * strings / exact decimals instead).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(CorePack, AnalyticsPack, RelationalPack, PipelinePack)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A1∘O1 — the reference's planning query (flows/main_flow.py:153-169). */
  def entry(spark: SparkSession): DataFrame =
    IndexerOps.indexOrder(Tables.envelope(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_.queries).reduce(_ ++ _)

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check.
    *
    * Every oracle ships with its CTE heads fenced `AS MATERIALIZED`
    * ([[graft.operators.VectorOps.materializedCtes]]): DuckDB's default
    * CTE inlining re-derives shared subtrees per reference, which made
    * the four k-means-training oracles (x44/x62/x63/x67) take 4–5 min
    * EACH at sf0.01 and broke the round-9 gate; fenced, the full
    * 114-oracle suite runs in well under a minute with per-query results
    * verified identical (including row order) to the un-fenced plans. */
  def oracleSql: Map[String, String] =
    packs.map(_.oracle).reduce(_ ++ _)
      .view.mapValues(graft.operators.VectorOps.materializedCtes).toMap
}
