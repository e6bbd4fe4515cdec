package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A ranked term count. */
case class TokenCount(token: String, n: Long)

/** Typed `Aggregator` (SURVEY.md §7.4's custom-aggregate surface):
  * per-group top-k tokens by exact count, deterministic tiebreak
  * (count desc, token asc).
  *
  * Compared to the two-aggregation form (term counts → window rank →
  * filter), this runs ONE shuffle: partial token→count maps combine
  * map-side, and only vocabulary-sized buffers cross the wire — the
  * heavy-hitters shape. Buffers are vocabulary-bounded (exact counts);
  * swap in a space-saving sketch for open vocabularies at extreme
  * scale. */
class TopTokensAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[TokenCount]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], token: String): Map[String, Long] =
    b.updated(token, b.getOrElse(token, 0L) + 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (t, n)) => acc.updated(t, acc.getOrElse(t, 0L) + n) }

  override def finish(b: Map[String, Long]): Seq[TokenCount] =
    b.toSeq.map { case (t, n) => TokenCount(t, n) }
      .sortBy(tc => (-tc.n, tc.token)).take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Seq[TokenCount]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TokenCount]]()
}

/** Space-Saving (Misra–Gries) sketch `Aggregator`: top-k heavy hitters
  * with a HARD `capacity`-entry buffer bound, for open vocabularies
  * where [[TopTokensAgg]]'s exact map could not fit in executor memory.
  * Classic guarantee: any token with true count > N/capacity is
  * guaranteed present; reported counts overestimate by at most the
  * minimum evicted counter. Merge adds counters pairwise then re-prunes
  * to capacity — the standard mergeable-summaries construction. */
class SpaceSavingTopTokensAgg(k: Int, capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[TokenCount]] {
  require(capacity >= k, s"capacity ($capacity) must be >= k ($k)")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], token: String): Map[String, Long] =
    if (b.contains(token) || b.size < capacity)
      b.updated(token, b.getOrElse(token, 0L) + 1L)
    else {
      // evict the minimum counter, inherit its count + 1 (Space-Saving)
      val (evict, minN) = b.minBy { case (t, n) => (n, t) }
      (b - evict).updated(token, minN + 1L)
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val merged = b.foldLeft(a) { case (acc, (t, n)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + n)
    }
    if (merged.size <= capacity) merged
    else merged.toSeq.sortBy { case (t, n) => (-n, t) }.take(capacity).toMap
  }

  override def finish(b: Map[String, Long]): Seq[TokenCount] =
    b.toSeq.map { case (t, n) => TokenCount(t, n) }
      .sortBy(tc => (-tc.n, tc.token)).take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Seq[TokenCount]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TokenCount]]()
}

object TopTokens {
  /** Per-language top-k tokens over `documents`: one typed aggregation,
    * flattened to (lang, rank, token, n) rows. */
  def langTopTokens(docs: DataFrame, k: Int): DataFrame =
    flatten(aggTokens(docs, new TopTokensAgg(k)))

  /** Sketch variant: same output shape, `capacity`-bounded buffers. */
  def langTopTokensSketch(docs: DataFrame, k: Int, capacity: Int): DataFrame =
    flatten(aggTokens(docs, new SpaceSavingTopTokensAgg(k, capacity)))

  private def aggTokens(docs: DataFrame,
      agg: Aggregator[String, Map[String, Long], Seq[TokenCount]]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("lang"),
        explode(graft.operators.TextOps.tokens(col("text"))).as("token"))
      .as[(String, String)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("top"))
      .toDF("lang", "top")
  }

  private def flatten(df: DataFrame): DataFrame =
    df.select(col("lang"), posexplode(col("top")).as(Seq("pos", "tc")))
      .select(col("lang"), (col("pos") + 1).as("rank"),
        col("tc.token"), col("tc.n"))
}
