package graft

import java.nio.file.Files
import graft.operators.Analytics
import graft.sources.Tables
import graft.streaming.StatefulSessions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** flatMapGroupsWithState sessionization must agree with the batch
  * session_window aggregate: every emitted session identical, and per
  * user everything except (at most) the final still-open session is
  * emitted (the last one only closes once the event-time watermark
  * passes its end). */
class StatefulSessionsSpec extends AnyFunSuite with SparkSpec {

  test("streaming stateful sessions ≡ batch session_window (closed prefix per user)") {
    // file-stream source from the events fixture
    val src = Files.createTempDirectory("sess-src")
    val ev = Tables.events(spark, sf).select("user_id", "ts")
    ev.coalesce(1).write.mode("overwrite").parquet(src.toString)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(src.toString).schema
    val stream = Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(src.toString))

    val out = StatefulSessions.sessionize(spark, stream)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("sessions")
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("e"),
        col("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toList).toMap

    val want = Analytics.sessionCounts(Tables.events(spark, sf), "ts", "8 hours", "user_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toList).toMap

    assert(got.nonEmpty, "no sessions emitted")
    // every user's emitted sessions are a prefix of the batch sessions,
    // missing at most the final (still-open) one
    want.foreach { case (user, sessions) =>
      val emitted = got.getOrElse(user, Nil)
      assert(emitted.length >= sessions.length - 1,
        s"user $user: emitted ${emitted.length} of ${sessions.length}")
      assert(sessions.startsWith(emitted) || sessions == emitted,
        s"user $user: emitted sessions diverge\n got: $emitted\nwant: $sessions")
    }
    // no emitted session may be absent from the batch result
    got.foreach { case (user, emitted) =>
      val sessions = want.getOrElse(user, Nil)
      assert(emitted.forall(sessions.contains), s"user $user: phantom session")
    }
  }
}
