package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One attributed left event (the emitted record; matches the batch
  * [[graft.operators.Analytics.asOfJoin]] output schema). */
case class AsOfOut(user_id: Long, l_id: Long, r_id: Option[Long],
    lag_micros: Option[Long])

/** Per-user as-of state between micro-batches (epoch micros):
  * `clicks` holds right-side events still relevant to some future left
  * event — everything inside the watermark horizon plus the single
  * DOMINANT older click (max ts, then max id; any earlier one can never
  * win an as-of match again) — and `pending` holds left events whose
  * event time the watermark has not passed yet. */
case class AsOfState(clicks: Seq[(Long, Long)], pending: Seq[(Long, Long)])

/** Stream-stream AS-OF join via `flatMapGroupsWithState` — the stateful
  * streaming twin of [[graft.operators.Analytics.asOfJoin]] (tw5), for
  * the join Spark's stream-stream machinery cannot express (its interval
  * join needs a bounded time range; as-of is unbounded-preceding).
  *
  * Mechanics: both sides union into ONE keyed stream (side-tagged), so a
  * single event-time watermark orders finalization. A left event emits
  * only once the watermark passes its event time — no earlier click can
  * still arrive (rows later than the watermark are dropped on arrival,
  * the standard watermark contract). State per user is bounded: left
  * events inside the lateness horizon + right events inside the horizon
  * + ONE dominant older right event — the streaming-native "latest value
  * per key" table, O(#active keys) like a stream-static dimension, swept
  * forward by the watermark rather than scanned.
  *
  * Emitted matches are bit-identical to the batch operator's (same
  * at-or-before semantics, same (ts, id) tiebreak); StreamingSpec pins
  * the append end state equal to the batch result over the watermark-
  * finalized prefix.
  */
object StatefulAsOf {

  private def toUs(i: java.time.Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  /** As-of attribute `left` (e.g. purchases) to the latest `right` (e.g.
    * clicks) per user at-or-before each left event. Inputs need
    * (event_id, user_id, ts). */
  def asOf(spark: SparkSession, left: DataFrame, right: DataFrame,
      lateness: String = "1 hour"): Dataset[AsOfOut] = {
    import spark.implicits._
    val tagged = right.select(col("user_id").cast("long"),
        col("ts").cast("timestamp"), lit(0).as("side"), col("event_id").cast("long"))
      .unionByName(left.select(col("user_id").cast("long"),
        col("ts").cast("timestamp"), lit(1).as("side"), col("event_id").cast("long")))
    tagged.withWatermark("ts", lateness)
      .as[(Long, java.time.Instant, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsOfState, AsOfOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state: GroupState[AsOfState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(AsOfState(Nil, Nil))
          // watermark contract: rows at-or-older than the mark are late
          // and dropped (a kept late click could retro-change an already
          // emitted attribution)
          val fresh = rows.filter(r => toUs(r._2) > wmUs).toSeq
          val clicks = prev.clicks ++
            fresh.collect { case (_, ts, 0, id) => (toUs(ts), id) }
          val pending = prev.pending ++
            fresh.collect { case (_, ts, 1, id) => (toUs(ts), id) }
          // finalize left events the watermark has passed, in (ts, id)
          // order; match = max (ts, id) click at-or-before
          val (emit, hold) = pending.partition(_._1 <= wmUs)
          val out = emit.sorted.map { case (pTs, pId) =>
            val best = clicks.filter(_._1 <= pTs)
              .reduceOption((a, b) => if (Ordering[(Long, Long)].gteq(a, b)) a else b)
            AsOfOut(user, pId, best.map(_._2), best.map(pTs - _._1))
          }
          // prune clicks: all inside the horizon + the dominant older one
          val (live, old) = clicks.partition(_._1 > wmUs)
          val dominant = old.reduceOption((a, b) =>
            if (Ordering[(Long, Long)].gteq(a, b)) a else b)
          val next = AsOfState(live ++ dominant, hold)
          if (next.clicks.isEmpty && next.pending.isEmpty) state.remove()
          else {
            state.update(next)
            // wake when the watermark passes the earliest held left event
            if (hold.nonEmpty)
              state.setTimeoutTimestamp((hold.map(_._1).min + 999L) / 1000L)
          }
          out.iterator
      }
  }
}
