package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Measurement tool (optimization guide §1): per-stage wall/CPU/shuffle
  * breakdown of a single registered query's execution, printed as a
  * table. NOT part of the driver contract — adds no query, never timed
  * by the bench; exists so "where does query X's time go" is answered
  * with stage metrics instead of guesses (the Spark UI is disabled in
  * the bench harness, so this is the listener-based equivalent).
  *
  * Usage: SPARK_GRAFT_PROFILE=x43_semantic_dedup[,x36_...] \
  *   sbt "runMain graft.StageProfile" [sfDir]
  * Runs each named query once untimed (codegen/artifact warmup — the
  * bench's own convention), then once under the listener.
  */
object StageProfile {
  private final class Rec(var name: String = "") {
    var tasks = 0
    var runMs = 0L // executor run time (sum over tasks)
    var cpuMs = 0L
    var gcMs = 0L
    var shufReadB = 0L
    var shufWriteB = 0L
    var inputB = 0L
    var submitted = 0L
    var completed = 0L
    var spillB = 0L
    var deserMs = 0L
    var deserCpuMs = 0L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROFILE", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "set SPARK_GRAFT_PROFILE=<query>[,<query>...]")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.NanoWatermarkPushdown.install(spark)
    graft.plans.RankTowerFusion.install(spark)
    graft.functions.VectorFunctions.register(spark)
    spark.range(1 << 20).selectExpr("sum(id)").collect()

    val stages = mutable.LinkedHashMap.empty[Int, Rec]
    var collecting = false
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (collecting) synchronized {
          val r = stages.getOrElseUpdate(e.stageInfo.stageId, new Rec)
          // first graft-package frame of the submission call stack — far
          // more telling than the callSite shortForm for broadcast jobs
          val g = e.stageInfo.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("StageProfile"))
            .map(_.trim).getOrElse("")
          val scopes = e.stageInfo.rddInfos
            .flatMap(_.scope).map(_.name)
            .distinct.mkString(">")
          r.name = e.stageInfo.name + " | " + g.take(60) +
            " | " + scopes.take(400)
          r.submitted = System.currentTimeMillis()
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collecting) synchronized {
          stages.get(e.stageInfo.stageId).foreach(_.completed =
            System.currentTimeMillis())
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (collecting) synchronized {
          val r = stages.getOrElseUpdate(e.stageId, new Rec)
          val m = e.taskMetrics
          if (m != null) {
            r.tasks += 1
            r.runMs += m.executorRunTime
            r.cpuMs += m.executorCpuTime / 1000000L
            r.gcMs += m.jvmGCTime
            r.shufReadB += m.shuffleReadMetrics.totalBytesRead
            r.shufWriteB += m.shuffleWriteMetrics.bytesWritten
            r.inputB += m.inputMetrics.bytesRead
            r.spillB += m.memoryBytesSpilled
            r.deserMs += m.executorDeserializeTime
            r.deserCpuMs += m.executorDeserializeCpuTime / 1000000L
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // warmup (artifacts + codegen), untimed — same as the bench
      fn(spark, sfDir).count()
      stages.clear()
      collecting = true
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wallS = (System.nanoTime() - t0) / 1e9
      // listener bus is async; let events drain
      Thread.sleep(600)
      collecting = false
      val snap = synchronized { stages.toSeq }
      println(f"%nPROFILE $name: wall=$wallS%.3f s, rows=$n, stages=${snap.size}")
      println(f"${"stage"}%7s ${"wall_ms"}%8s ${"run_ms"}%8s ${"cpu_ms"}%8s " +
        f"${"gc_ms"}%6s ${"tasks"}%5s ${"in_MB"}%8s ${"sh_r_MB"}%8s " +
        f"${"sh_w_MB"}%8s ${"spill_MB"}%8s  name")
      snap.sortBy(-_._2.runMs).foreach { case (id, r) =>
        val wall = if (r.completed > 0 && r.submitted > 0)
          r.completed - r.submitted else -1L
        println(f"$id%7d $wall%8d ${r.runMs}%8d ${r.cpuMs}%8d ${r.gcMs}%6d " +
          f"${r.tasks}%5d ${r.inputB / 1e6}%8.1f ${r.shufReadB / 1e6}%8.1f " +
          f"${r.shufWriteB / 1e6}%8.1f ${r.deserMs}%7d ${r.deserCpuMs}%7d  ${r.name.take(330)}")
      }
      val totRun = snap.map(_._2.runMs).sum
      val totCpu = snap.map(_._2.cpuMs).sum
      println(f"TOTALS $name: run=${totRun}ms cpu=${totCpu}ms " +
        f"(wall x cores = ${(wallS * cpus.toInt * 1000).toLong}ms)")
    }
    spark.stop()
  }
}
