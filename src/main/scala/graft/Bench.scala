package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session setup the extensions class provides in production
    graft.plans.NanoWatermarkPushdown.install(spark)
    graft.functions.VectorFunctions.register(spark)
    // JVM/codegen/IO warmup outside the timed loop: one full untimed pass
    // over EVERY query. A single warmup query is not enough — whole-stage
    // codegen compiles per plan shape and C2 compiles the interpreter hot
    // paths over seconds of wall time, so whichever timed query first
    // touched a path (timestamp aggs, JSON parse, window) absorbed that
    // compilation in both its back-to-back runs (measured: tw1 2.7 s
    // cold-path vs 0.22 s steady-state at sf0.1). Steady-state latency is
    // the quantity min-of-N is meant to report.
    try {
      spark.range(1 << 20).selectExpr("sum(id)").collect()
      SparkEntry.queries.foreach { case (_, f) =>
        try f(spark, sfDir).count() catch { case _: Throwable => () }
      }
    } catch { case _: Throwable => () }
    // (name, seconds, error): best of `Runs` timings (first run pays
    // codegen compilation; min is the steady-state latency). Failures
    // keep their timing but are reported explicitly — a broken query
    // must never masquerade as a fast one.
    val Runs = 2
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val timings = (1 to Runs).map { _ =>
        val t0 = System.nanoTime()
        val err =
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable => Some(e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(120)) }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val err = timings.flatMap(_._2).headOption
      (name, timings.map(_._1).min, err)
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    // 3-dp timings keep the whole 78-query line ~2 KB — full-precision
    // doubles made it ~4 KB and the driver's bounded tail capture
    // truncated it every round ("parsed": null in BENCH_r1–r4)
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v, _) => s"${q(k)}:${r3(v)}" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${q(k)}:${q(e)}" }
      .mkString("{", ",", "}")
    val total = r3(results.map(_._2).sum)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_failed":${results.count(_._3.isDefined)},"runs_per_query":$Runs,"sf":"$sfDir"}"""
    // printed twice — before shutdown (in case stop() hangs/crashes) and
    // after (so the FINAL stdout line is the parseable artifact even if
    // shutdown logging interleaves)
    println(line)
    spark.stop()
    println(line)
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
