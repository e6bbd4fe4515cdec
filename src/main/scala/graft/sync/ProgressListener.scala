package graft.sync

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** A8 — sync progress checkpoints (reference flows/main_flow.py:357-363,
  * 428-433 logs every `record_count/10` records): a SparkListener that
  * watches task output metrics and fires a callback at every `interval`
  * records written, cluster-wide. Listener events arrive on the driver's
  * listener bus regardless of executor count, so the same code reports
  * progress on local[32] and on a 1000-executor cluster.
  *
  * Usage: `val l = new ProgressListener(n, cb); sc.addSparkListener(l);
  * try { job } finally sc.removeSparkListener(l)`.
  */
class ProgressListener(interval: Long, onProgress: Long => Unit)
    extends SparkListener {
  require(interval >= 1, s"interval must be >= 1, got $interval")

  private val written = new AtomicLong(0L)
  private val lastReported = new AtomicLong(0L)

  /** Total records written by completed tasks so far. */
  def recordsWritten: Long = written.get()

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null && m.outputMetrics != null && m.outputMetrics.recordsWritten > 0) {
      val total = written.addAndGet(m.outputMetrics.recordsWritten)
      // fire once per crossed interval boundary (monotone, race-safe)
      var fired = false
      var last = lastReported.get()
      while (!fired && total / interval > last / interval) {
        if (lastReported.compareAndSet(last, total)) fired = true
        else last = lastReported.get()
      }
      if (fired) onProgress(total)
    }
  }
}
