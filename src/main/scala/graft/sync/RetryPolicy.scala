package graft.sync

import scala.util.control.NonFatal

/** Sink-side fault-tolerance knobs of the reference, as a reusable policy
  * (SURVEY.md T5/T6/T10; reference flows/main_flow.py:413-473,722-723):
  * bounded retries with backoff, plus adaptive chunk-size degradation —
  * on repeated failure shrink the write batch 500→(−50 steps)→(−10)→(−1)
  * before giving up (flows/main_flow.py:439-451).
  *
  * `sleep` is injectable so tests run without wall-clock waits. In the
  * parquet harness the "chunk" maps to writer batch sizing; on a real
  * bulk sink it is the per-request action count.
  */
case class RetryPolicy(
    maxRetries: Int = 10,
    initialBackoffMs: Long = 30000,
    maxBackoffMs: Long = 200000,
    sleep: Long => Unit = Thread.sleep) {

  /** Run `op`, retrying with exponential backoff. Returns the result or
    * rethrows the last failure after `maxRetries` attempts. */
  def retry[A](op: () => A): A = {
    var attempt = 0
    var backoff = initialBackoffMs
    while (true) {
      try return op()
      catch {
        case NonFatal(e) =>
          attempt += 1
          if (attempt > maxRetries) throw e
          sleep(backoff)
          backoff = math.min(backoff * 2, maxBackoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** T6 — adaptive chunk degradation schedule: 500, 450, …, 50, 40, 30,
    * 20, 10, 9, …, 1 (reference shrinks by 50 while >50, by 10 while >10,
    * then by 1). */
  def chunkSchedule(start: Int): LazyList[Int] =
    LazyList.iterate(start) { c =>
      if (c > 50) c - 50 else if (c > 10) c - 10 else c - 1
    }.takeWhile(_ >= 1)

  /** Run `op(chunkSize)` walking the degradation schedule on failure;
    * sleeps `reconnectMs` between attempts (reference sleeps 120 s,
    * flows/main_flow.py:440) — but not after the final chunk size, where
    * the failure is terminal. */
  def withAdaptiveChunks[A](startChunk: Int, reconnectMs: Long = 120000)
      (op: Int => A): A = {
    require(startChunk >= 1, s"startChunk must be >= 1, got $startChunk")
    val sizes = chunkSchedule(startChunk).toList
    var last: Throwable = null
    for ((size, i) <- sizes.zipWithIndex) {
      try return op(size)
      catch {
        case NonFatal(e) =>
          last = e
          if (i < sizes.length - 1) sleep(reconnectMs)
      }
    }
    throw last
  }
}
