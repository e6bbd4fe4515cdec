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
  * heavy-hitters shape. Buffers are MUTABLE maps updated in place —
  * `Aggregator` explicitly permits mutating and returning the buffer,
  * and an immutable `updated` per token would allocate a fresh map per
  * input row. Vocabulary-bounded (exact counts); swap in the
  * space-saving sketch below for open vocabularies at extreme scale. */
class TopTokensAgg(k: Int)
    extends Aggregator[String, scala.collection.mutable.HashMap[String, Long], Seq[TokenCount]] {
  private type Buf = scala.collection.mutable.HashMap[String, Long]

  override def zero: Buf = scala.collection.mutable.HashMap.empty

  override def reduce(b: Buf, token: String): Buf = {
    b.update(token, b.getOrElse(token, 0L) + 1L); b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (t, n) => a.update(t, a.getOrElse(t, 0L) + n) }; a
  }

  override def finish(b: Buf): Seq[TokenCount] =
    b.toSeq.map { case (t, n) => TokenCount(t, n) }
      .sortBy(tc => (-tc.n, tc.token)).take(k)

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
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
    extends Aggregator[String, scala.collection.mutable.HashMap[String, Long], Seq[TokenCount]] {
  require(capacity >= k, s"capacity ($capacity) must be >= k ($k)")
  private type Buf = scala.collection.mutable.HashMap[String, Long]

  override def zero: Buf = scala.collection.mutable.HashMap.empty

  override def reduce(b: Buf, token: String): Buf = {
    if (b.contains(token) || b.size < capacity)
      b.update(token, b.getOrElse(token, 0L) + 1L)
    else {
      // evict the minimum counter, inherit its count + 1 (Space-Saving)
      val (evict, minN) = b.minBy { case (t, n) => (n, t) }
      b.remove(evict)
      b.update(token, minN + 1L)
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (t, n) => a.update(t, a.getOrElse(t, 0L) + n) }
    if (a.size <= capacity) a
    else scala.collection.mutable.HashMap.from(
      a.toSeq.sortBy { case (t, n) => (-n, t) }.take(capacity))
  }

  override def finish(b: Buf): Seq[TokenCount] =
    b.toSeq.map { case (t, n) => TokenCount(t, n) }
      .sortBy(tc => (-tc.n, tc.token)).take(k)

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
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
      agg: Aggregator[String, scala.collection.mutable.HashMap[String, Long],
        Seq[TokenCount]]): DataFrame = {
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
