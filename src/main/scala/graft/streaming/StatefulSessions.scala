package graft.streaming

import java.time.Instant
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One closed activity session (the emitted record). */
case class SessionOut(user_id: Long, session_start: Instant,
    session_end: Instant, n: Long)

/** Open-session state carried between micro-batches (epoch micros —
  * java.sql.Timestamp/getTime would truncate to millis). */
case class SessionState(startUs: Long, lastUs: Long, n: Long)

/** Custom keyed streaming state via `flatMapGroupsWithState`
  * (SURVEY.md §2.8 note; builder brief "mapGroupsWithState /
  * flatMapGroupsWithState for custom state"): event-time sessionization
  * with explicit state + event-time timeout — the hand-rolled twin of
  * `session_window`, for session logic the builtin can't express
  * (per-key gaps, session caps, custom emit payloads).
  *
  * Scale notes: state lives in the state store partitioned by key — one
  * `SessionState` per OPEN session per user, independent of history
  * length; the watermark bounds retention, and timeouts fire per key
  * without scanning other keys' state.
  */
object StatefulSessions {

  val GapUs: Long = 8L * 3600 * 1000 * 1000 // same 8h gap as batch tw3

  private def toUs(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  private def toInstant(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L)

  /** Sessionize a watermarked stream of (user_id, ts). Emits a session
    * when the gap passes (within a batch) or when the event-time
    * watermark times the key out. */
  def sessionize(spark: SparkSession, events: DataFrame,
      lateness: String = "1 hour"): Dataset[SessionOut] = {
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("ts").cast("timestamp"))
      .withWatermark("ts", lateness)
      .as[(Long, Instant)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the open session's end: close and emit
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, toInstant(s.startUs),
              toInstant(s.lastUs + GapUs), s.n))
          } else {
            val sorted = rows.map(r => toUs(r._2)).toSeq.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.lastUs <= GapUs =>
                  cur = Some(s.copy(lastUs = math.max(s.lastUs, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(user, toInstant(s.startUs),
                    toInstant(s.lastUs + GapUs), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout once the watermark passes last + gap (ceil to ms)
              state.setTimeoutTimestamp(Math.addExact(s.lastUs + GapUs, 999L) / 1000L)
            }
            closed.reverseIterator
          }
      }
  }
}
