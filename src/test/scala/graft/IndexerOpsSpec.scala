package graft

import graft.operators.IndexerOps
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IndexerOpsSpec extends AnyFunSuite with SparkSpec {

  lazy val env = Tables.envelope(spark, sf).cache()

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs and every query has matching columns with its oracle declaration") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      info(s"$name -> $n rows")
    }
    // every oracle key must have a query
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("indexOrder is ascending by count") {
    val rows = IndexerOps.indexOrder(env).collect()
    val counts = rows.map(_.getLong(1))
    assert(counts.sorted.sameElements(counts))
    assert(rows.map(_.getString(0)).toSet ==
      Set("click", "view", "purchase", "signup", "error"))
  }

  test("fullSyncScan excludes tombstones and respects IN-list") {
    val out = IndexerOps.fullSyncScan(env, Seq("click", "error"))
    assert(out.where(col("is_deleted")).count() == 0)
    assert(out.select("idx").distinct().collect().map(_.getString(0)).toSet == Set("click"))
  }

  test("incrementalScan keeps tombstones flowing") {
    val out = IndexerOps.incrementalScan(env,
      Seq("click", "view", "purchase", "signup", "error"), "2024-01-01 00:00:00")
    assert(out.where(col("is_deleted")).count() > 0)
  }

  test("actionRouting: deletes have null source, op_type split is exact") {
    val acts = IndexerOps.actionRouting(env, "t1")
    val deletes = acts.where(col("op_type") === "delete")
    assert(deletes.where(col("source").isNotNull).count() == 0)
    assert(acts.where(col("op_type") === "index").count() ==
      env.where(!col("is_deleted")).count())
    assert(acts.select("target_index").distinct().count() == 5)
  }

  test("orphanIndexes finds exactly the tombstone-only physical indexes") {
    val orphans = IndexerOps.orphanIndexes(
      IndexerOps.physicalCatalog(env), IndexerOps.aliasCatalog(env))
    val names = orphans.collect().map(_.getString(0))
    assert(names.nonEmpty && names.forall(_.startsWith("error_")))
  }

  test("containment joins broadcast the catalog side") {
    val plan = IndexerOps.orphanIndexes(
      IndexerOps.physicalCatalog(env), IndexerOps.aliasCatalog(env))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("countReconciliation flags only mismatched indexes") {
    val stored = env.where(!col("is_deleted"))
    val clean = IndexerOps.countReconciliation(stored, env)
    assert(clean.count() == 0)
    val drifted = IndexerOps.countReconciliation(
      stored.where(col("idx") =!= "click"), env)
    assert(drifted.collect().map(_.getString(0)).sameElements(Array("click")))
  }

  test("schemaDrift empty when stores agree") {
    assert(IndexerOps.schemaDrift(env, env, "$.k").count() == 0)
  }
}
