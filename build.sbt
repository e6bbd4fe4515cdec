ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "prefectflowarcindexerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Project-level (unscoped), NOT `run /`-scoped: the driver invokes
// `sbt "runMain graft.Bench"`, and sbt's delegation for a key scoped
// (proj, Compile, runMain) never consults (proj, Zero-config, run) —
// so `run / fork` and `run / outputStrategy` were invisible to
// runMain, which is why BENCH_r6's JSON still carried an "[info] "
// prefix despite the round-6 `run /` settings. Unscoped settings sit
// at (proj, *, *), which BOTH run and runMain delegate to.
fork := true
outputStrategy := Some(OutputStrategy.StdoutOutput)
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as JSON. sbt's "[success] Total time: …" epilogue prints AFTER the
// program's output and has broken that parse every round ("parsed":
// null in BENCH_r1–r6). Suppressing the success line makes Bench's
// compact JSON the true final line regardless of how sbt is invoked,
// and StdoutOutput passes the forked JVM's stdout through unprefixed
// (the default logger strategy prepends "[info] ", which a strict
// JSON parse of the last line would also choke on).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess // consumed by the command engine, not a task
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap + GC sized for the single-JVM local[32] harness, not for a real
// executor: the 114-query registry's warmup-plus-timed passes hold far
// more live plan/broadcast/codegen state than one production query
// would, and in an 8g heap that turned into a suite-wide GC tax (the
// round-9 bench regression: the SAME 106 queries measured 63.3 s under
// 8g+G1 vs 45.0 s under 24g+ParallelGC on one machine, with the
// slowdown spread uniformly over untouched queries — the GC-pressure
// signature, not a plan change). ParallelGC is the right collector for
// a throughput batch harness (no latency SLO); the box has 128 GiB.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+UseParallelGC",
)

// ---- test-suite parallelization (round 21) -------------------------------
// The suite ran ~30 min single-JVM-sequential — past the verification
// harness budget (VERIFY_r20 tests_ok=false: the run was cut mid-suite
// with zero failures). Suites are independent except for two couplings,
// so run them as ISOLATED forked JVMs in parallel:
//  - each group gets its own JVM and SparkSession (suites mutate session
//    conf — codegen factoryMode, broadcast thresholds, nanosAsLong — so
//    sharing one session across concurrent suites would race);
//  - IndexerOpsSpec + PlanSpec stay in ONE group: both iterate the full
//    SparkEntry registry at sf0.001, whose snapshot artifacts memoize
//    under java.io.tmpdir behind JVM-level locks — two cold JVMs racing
//    the same artifact key would corrupt the build; sequential-in-one-JVM
//    keeps today's build-once-reuse semantics;
//  - RetrievalServeSpec (15.3 min alone, the wall-clock long pole) is
//    split into three same-coverage classes (A=the original name/B/C).
// Test JVMs get 8g (a single suite's working set), not the bench's 24g.
Test / javaOptions := jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  "-Xmx8g",
  "-XX:+UseParallelGC",
)
Test / testGrouping := {
  val groupOf: String => String = {
    case "graft.RetrievalServeSpec"  => "serveA"
    case "graft.RetrievalServeSpecB" => "serveB"
    case "graft.RetrievalServeSpecC" => "serveC"
    case "graft.StreamingSpec"       => "streaming"
    case "graft.StreamingSpecB"      => "streamingB"
    case "graft.PipelineSpec"        => "pipeline"
    case "graft.SyncPipelineSpec"    => "sync"
    case "graft.IndexerOpsSpec"      => "registry"
    case "graft.PlanSpec"            => "registry"
    case _                           => "misc"
  }
  val opts = (Test / forkOptions).value
  (Test / definedTests).value.groupBy(t => groupOf(t.name)).map {
    case (name, tests) =>
      Tests.Group(name, tests, Tests.SubProcess(opts))
  }.toSeq
}
// allow the forked groups to actually run concurrently (sbt's default
// caps forked test groups at 1); 8 ≈ the balance point where the four
// ~5-min groups overlap fully on a 32-core box without stampeding
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 8),
  Tags.limitAll(12),
)
