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
    graft.plans.RankTowerFusion.install(spark)
    graft.functions.VectorFunctions.register(spark)
    // JVM/codegen/IO warmup outside the timed loop: one full untimed pass
    // over EVERY query. A single warmup query is not enough — whole-stage
    // codegen compiles per plan shape and C2 compiles the interpreter hot
    // paths over seconds of wall time, so whichever timed query first
    // touched a path (timestamp aggs, JSON parse, window) absorbed that
    // compilation in both its back-to-back runs (measured: tw1 2.7 s
    // cold-path vs 0.22 s steady-state at sf0.1). Steady-state latency is
    // the quantity min-of-N is meant to report.
    // optional focus set for local iteration (comma-separated names);
    // the driver never sets it — absent means the full registry
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    try {
      spark.range(1 << 20).selectExpr("sum(id)").collect()
      selected.foreach { case (_, f) =>
        try f(spark, sfDir).count() catch { case _: Throwable => () }
      }
    } catch { case _: Throwable => () }
    // (name, seconds, error): best of `Runs` timings (first run pays
    // codegen compilation; min is the steady-state latency). Failures
    // keep their timing but are reported explicitly — a broken query
    // must never masquerade as a fast one.
    // Name-sorted, NOT map order: hash-map order reshuffles whenever the
    // registry gains a query, and with it every query's JIT/GC/page-cache
    // neighborhood — measured swinging x2_minhash_pairs 0.57–2.69 s across
    // same-code runs. A fixed order makes per-query numbers comparable
    // round over round.
    val Runs = 2
    val results = selected.map { case (name, fn) =>
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
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v, _) => s"${q(k)}:${r3(v)}" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${q(k)}:${q(e)}" }
      .mkString("{", ",", "}")
    val total = r3(results.map(_._2).sum)
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_failed":${results.count(_._3.isDefined)},"runs_per_query":$Runs,"sf":"$sfDir"}"""
    // The FINAL stdout line must parse inside the driver's bounded
    // (~2.2 KB) tail capture, which the full 86-query map has outgrown
    // ("parsed": null in BENCH_r1–r5). Three copies of the data, most
    // durable first: the full JSON as a FILE next to the repo, the full
    // JSON early on stdout, and a compact last line (total + the slowest
    // queries) that always fits the tail window.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "bench_detail.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath), full + "\n")
    catch { case _: Throwable => () }
    println(full)
    val slowest = results.sortBy(-_._2).take(12)
      .map { case (k, v, _) => s"${q(k)}:${r3(v)}" }.mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","queries":$slowest,"queries_shown":"12 slowest of ${results.size} (full map: earlier stdout line + $detailPath)","errors":$errs,"n_queries":${results.size},"n_failed":${results.count(_._3.isDefined)},"runs_per_query":$Runs,"sf":"$sfDir"}"""
    println(compact)
    spark.stop()
    // the final line, printed after stop() so shutdown logging cannot
    // interleave past it
    println(compact)
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
