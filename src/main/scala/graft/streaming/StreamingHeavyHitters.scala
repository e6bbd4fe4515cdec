package graft.streaming

import graft.functions.MisraGries
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** The running sketch carried between micro-batches: total tokens seen
  * for the key, plus the ≤ k surviving counters. */
case class HeavySketch(n_seen: Long, tokens: Map[String, Long])

/** One emitted counter row; `n_seen` tags the emission's stream
  * position, so the end-state sketch is the rows with each key's
  * maximum `n_seen`. */
case class HeavyHit(lang: String, n_seen: Long, token: String, est: Long)

/** Continuous heavy-hitters over a document stream: the
  * [[graft.functions.MisraGriesAgg]] sketch as `mapGroupsWithState`
  * custom keyed state — live per-language vocabulary monitoring
  * ("which tokens dominate the crawl RIGHT NOW") without ever holding
  * more than k counters per language, at any stream length. The third
  * member of the custom-state family ([[StatefulSessions]] =
  * sessionization, [[StatefulAsOf]] = as-of join).
  *
  * The per-key state is O(k) — corpus- and stream-length-independent —
  * and the insert is the SAME [[MisraGries.add]] the batch aggregate
  * uses, so the streaming sketch inherits the batch guarantees verbatim
  * (sequential inserts are exactly the single-buffer update path): at
  * every emission, each counter undercounts its token's true
  * stream-so-far count by at most n_seen/(k+1), and any token with true
  * count > n_seen/(k+1) is present. Emissions are tagged with `n_seen`
  * so downstream consumers (and the spec) can select each key's latest
  * sketch without event-time bookkeeping. */
object StreamingHeavyHitters {

  /** Track per-language heavy hitters over a streaming `(lang, text)`
    * frame; emits the full current sketch of every language touched by
    * each micro-batch (Update output mode). */
  def track(spark: SparkSession, docs: DataFrame, k: Int): Dataset[HeavyHit] = {
    import spark.implicits._
    docs.select(col("lang"), explode(TextOps.tokens(col("text"))).as("token"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[HeavySketch, Seq[HeavyHit]](
        GroupStateTimeout.NoTimeout()) {
        (lang, rows, state) =>
          val buf = new java.util.HashMap[String, Long]()
          var n = state.getOption.map(_.n_seen).getOrElse(0L)
          state.getOption.foreach(_.tokens.foreach { case (t, c) =>
            buf.put(t, c)
          })
          rows.foreach { r =>
            MisraGries.add(buf, r._2, 1L, k)
            n += 1
          }
          val snapshot = {
            val b = Map.newBuilder[String, Long]
            buf.forEach((t, c) => b += (t -> c))
            b.result()
          }
          state.update(HeavySketch(n, snapshot))
          snapshot.toSeq.sortBy(_._1)
            .map { case (t, c) => HeavyHit(lang, n, t, c) }
      }
      .flatMap(identity)
  }
}
