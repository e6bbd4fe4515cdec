package graft

import graft.operators.IndexerOps
import graft.sources.Tables
import graft.sources.Tables._
import graft.sync.{IndexStore, RetryPolicy, SyncPipeline, WatermarkStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SyncPipelineSpec extends AnyFunSuite with SparkSpec {

  lazy val env = Tables.envelope(spark, sf).cache()

  private def freshPipeline(): (IndexStore, WatermarkStore, SyncPipeline, String) = {
    val dir = Files.createTempDirectory("graft-sync").toString
    val store = new IndexStore(spark, dir)
    val wms = new WatermarkStore(dir)
    (store, wms, new SyncPipeline(store, wms), dir)
  }

  test("full sync: blue/green publish, counts reconcile, orphans removed") {
    val (store, _, pipe, _) = freshPipeline()
    // seed an orphan that no alias will reference
    store.writePhysical("stale_20230101", env.limit(3))
    val reports = pipe.fullSync(env, None, timestamp = "t1")
    assert(reports.map(_.index).toSet ==
      Set("click", "view", "purchase", "signup", "error"))
    assert(store.physicalIndexes().forall(_.endsWith("_t1")))
    assert(!store.indexExists("stale_20230101"))
    assert(pipe.reconcile(env, reports.map(_.index)).isEmpty)
    // tombstone-only 'error' index is empty but exists (alias bound)
    assert(store.count("error") == 0)
  }

  test("full sync ≡ incremental-from-epoch (same final state)") {
    val (storeA, _, pipeA, _) = freshPipeline()
    pipeA.fullSync(env, None, timestamp = "t1")
    val (storeB, _, pipeB, _) = freshPipeline()
    pipeB.incrementalSync(env, None, timestamp = "t1")
    for (idx <- Seq("click", "view", "purchase", "signup")) {
      val a = storeA.read(idx).get.select(Id, Document).orderBy(Id)
      val b = storeB.read(idx).get.select(Id, Document).orderBy(Id)
      assert(a.collect().sameElements(b.collect()), s"state differs for $idx")
    }
  }

  test("incremental sync applies upserts and tombstone deletes, then skips when caught up") {
    val (store, wms, pipe, _) = freshPipeline()
    val cutoff = "2024-01-15 00:00:00"
    val early = env.where(col(UpdatedAt) < lit(cutoff).cast("timestamp"))
    // bootstrap with the early slice, watermark persisted from early data
    pipe.fullSync(early, None, timestamp = "t1")
    val before = store.count("click")
    // second run over the full data applies only post-watermark changes
    val reports = pipe.incrementalSync(env, None, timestamp = "t2")
    val after = store.count("click")
    assert(after > before)
    assert(pipe.reconcile(env, Seq("click", "view", "purchase", "signup")).isEmpty)
    // third run: watermark is max(updated_at) → nothing to do
    val again = pipe.incrementalSync(env, None, timestamp = "t3")
    assert(again.forall(_.mode == "skipped"))
  }

  test("incremental delete: tombstoned id disappears from live state") {
    val (store, wms, pipe, _) = freshPipeline()
    // state where doc 42 is live in 'click'
    val doc42 = env.where(col(Id) === "42").limit(1)
      .select(lit("click").as(Idx), col(Id), col(Document),
        lit(false).as(IsDeleted), col(UpdatedAt))
    val initial = env.where(col(Idx) === "click").unionByName(doc42)
    pipe.fullSync(initial, Some(Seq("click")), timestamp = "t1")
    assert(store.read("click").get.where(col(Id) === "42").count() == 1)
    // CDC batch: same doc tombstoned later
    wms.save("2024-02-01 00:00:00")
    val tomb = doc42.select(col(Idx), col(Id), col(Document),
      lit(true).as(IsDeleted),
      lit("2024-02-02 00:00:00").cast("timestamp").as(UpdatedAt))
    pipe.incrementalSync(tomb, Some(Seq("click")), timestamp = "t2")
    assert(store.read("click").get.where(col(Id) === "42").count() == 0)
  }

  test("failed staging build rolls back (no staged dir, alias unchanged)") {
    val (store, _, pipe, _) = freshPipeline()
    pipe.fullSync(env, Some(Seq("click")), timestamp = "t1")
    val boundBefore = store.aliases()("click")
    val poisoned = env.select(col(Idx), col(Id),
      (col(Document).cast("double") / lit(0)).cast("string").as(Document),
      col(IsDeleted), col(UpdatedAt))
      .where(expr("raise_error('boom') IS NULL") || col(Idx) === "click")
    intercept[Exception] {
      pipe.fullSync(poisoned, Some(Seq("click")), timestamp = "t2")
    }
    assert(store.aliases()("click") == boundBefore)
    assert(!store.indexExists("click_t2"))
  }

  test("swap is idempotent and atomic-manifest based") {
    val (store, _, pipe, _) = freshPipeline()
    pipe.fullSync(env, Some(Seq("view")), timestamp = "t1")
    store.swapAlias("view", "view_t1")
    store.swapAlias("view", "view_t1")
    assert(store.aliases()("view") == "view_t1")
    assert(store.indexExists("view_t1"))
  }

  test("retry policy: backoff sequence and adaptive chunk schedule") {
    var sleeps = Vector.empty[Long]
    val p = RetryPolicy(maxRetries = 3, initialBackoffMs = 30, maxBackoffMs = 200,
      sleep = ms => sleeps :+= ms)
    var calls = 0
    val out = p.retry { () => calls += 1; if (calls < 3) sys.error("transient"); 42 }
    assert(out == 42 && sleeps == Vector(30, 60))
    assert(p.chunkSchedule(500).take(12).toList ==
      List(500, 450, 400, 350, 300, 250, 200, 150, 100, 50, 40, 30))
    assert(p.chunkSchedule(500).last == 1)
    var sizes = Vector.empty[Int]
    val r = p.withAdaptiveChunks(120, reconnectMs = 1) { c =>
      sizes :+= c; if (c > 100) sys.error("too big"); c
    }
    assert(r == 70 && sizes == Vector(120, 70))
  }

  test("watermark store: epoch sentinel, atomic save/load round-trip") {
    val dir = Files.createTempDirectory("graft-wm").toString
    val wms = new WatermarkStore(dir)
    assert(wms.loadOrEpoch() == "0001-01-01 00:00:00")
    wms.save("2024-01-30 23:26:16.220708")
    assert(wms.load().contains("2024-01-30 23:26:16.220708"))
  }
}
