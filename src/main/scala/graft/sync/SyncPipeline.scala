package graft.sync

import graft.operators.IndexerOps
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.control.NonFatal

/** Per-index sync outcome (the reference's log surface, as data). */
case class IndexSyncReport(
    index: String,
    physical: String,
    mode: String, // "full" | "incremental" | "skipped"
    upserts: Long,
    deletes: Long)

/** The reference flow's control plane re-expressed over an [[IndexStore]]
  * (SURVEY.md §3.1, T1-T11; reference flows/main_flow.py:602-762):
  * full blue/green reindex and incremental CDC sync with tombstone
  * deletes, smallest-first scheduling, schema-drift-triggered reindex,
  * zero-work skip, rollback of failed staging builds, orphan cleanup, and
  * post-sync count reconciliation.
  *
  * Scale design: the per-index loop drives independent Spark jobs (the
  * reference's Prefect task submits); each job's data path is a single
  * declarative plan — scan → filter → [merge join] → write — that Catalyst
  * plans with pushdown and AQE. State never flows through the driver
  * except per-index counts (one row each). The incremental merge is an
  * id-keyed anti-join ∪ union — shuffle on `id` only for the one index
  * being merged, broadcastable when the batch is small.
  */
class SyncPipeline(store: IndexStore, watermarks: WatermarkStore) {

  /** Index list selection (reference get_indexes_list /
    * lowercased user list, flows/main_flow.py:633-640). */
  def selectIndexes(env: DataFrame, requested: Option[Seq[String]]): Seq[String] =
    requested match {
      case Some(xs) => xs.map(_.toLowerCase)
      case None => IndexerOps.indexList(env).collect().map(_.getString(0)).toSeq.sorted
    }

  /** Smallest-first execution order (A1∘O1; reference
    * flows/main_flow.py:658-673): collect the per-index counts — one row
    * per index — and schedule ascending. */
  def planOrder(env: DataFrame, indexes: Seq[String]): Seq[(String, Long)] =
    IndexerOps.indexOrder(env.where(col(Idx).isin(indexes: _*)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Full blue/green sync (T4; reference main_flow full_sync branch):
    * stage `{index}_{ts}` from the full scan, swap the alias, reconcile.
    * A failure while staging rolls back the staged dir (T8) and rethrows. */
  def fullSync(env: DataFrame, indexes: Option[Seq[String]] = None,
      timestamp: String): Seq[IndexSyncReport] = {
    val selected = selectIndexes(env, indexes)
    if (selected.isEmpty) return Seq.empty // empty → early exit (:648-650)
    val order = planOrder(env, selected)
    val reports = order.map { case (idx, _) =>
      val staged = s"${idx}_$timestamp"
      try {
        val docs = IndexerOps.fullSyncScan(env, Seq(idx))
        store.writePhysical(staged, docs)
        store.swapAlias(idx, staged)
        IndexSyncReport(idx, staged, "full",
          upserts = store.count(idx), deletes = 0L)
      } catch {
        case NonFatal(e) =>
          store.deletePhysical(staged) // T8 rollback
          throw e
      }
    }
    store.cleanupOrphans() // K4, scheduled on the full-sync branch (:652-656)
    saveWatermarkFrom(env)
    reports
  }

  /** Incremental CDC sync (T1/T3; reference flows/main_flow.py:316-333,
    * 366-395,675-707): per index — drift check (T11) may force a full
    * reindex; zero-change skip (P11); otherwise merge the batch into the
    * live state and publish blue/green (atomic even for increments —
    * stronger than the reference's in-place bulk, same observable result). */
  def incrementalSync(env: DataFrame, indexes: Option[Seq[String]] = None,
      timestamp: String): Seq[IndexSyncReport] = {
    val wm = watermarks.loadOrEpoch()
    val selected = selectIndexes(env, indexes)
    val order = planOrder(env, selected)
    val reports = order.map { case (idx, _) =>
      val batch = IndexerOps.incrementalScan(env, Seq(idx), wm)
      val changed = batch.count() // A3 gate
      // T11 gate: drift requires a doc on BOTH sides with differing schema
      // names — an empty stored index (e.g. tombstone-only) is not drift.
      val drifted = store.read(idx).exists(cur =>
        IndexerOps.schemaDrift(cur, env.where(col(Idx) === idx), "$.k")
          .where(col("stored_name").isNotNull && col("source_name").isNotNull)
          .count() > 0)
      if (drifted) {
        // T11 — schema drift forces a full rebuild of this index
        val staged = s"${idx}_$timestamp"
        store.writePhysical(staged, IndexerOps.fullSyncScan(env, Seq(idx)))
        store.swapAlias(idx, staged)
        IndexSyncReport(idx, staged, "full", store.count(idx), 0L)
      } else if (changed == 0L) {
        IndexSyncReport(idx, store.aliases().getOrElse(idx, ""), "skipped", 0L, 0L)
      } else {
        val staged = s"${idx}_$timestamp"
        try {
          val (merged, ups, dels) = applyBatch(store.read(idx), batch)
          store.writePhysical(staged, merged)
          store.swapAlias(idx, staged)
          IndexSyncReport(idx, staged, "incremental", ups, dels)
        } catch {
          case NonFatal(e) => store.deletePhysical(staged); throw e
        }
      }
    }
    saveWatermarkFrom(env)
    reports
  }

  /** CDC merge via [[IndexerOps.cdcMerge]]; also returns upsert/delete
    * tallies (A7 — the reference's records/errors counters). */
  private[sync] def applyBatch(current: Option[DataFrame], batch: DataFrame)
      : (DataFrame, Long, Long) = {
    val nIds = batch.select(Id).distinct().count()
    val nDels = batch
      .groupBy(Id).agg(max_by(col(IsDeleted), col(UpdatedAt)).as(IsDeleted))
      .where(col(IsDeleted)).count()
    val cur = current.getOrElse(
      batch.sparkSession.emptyDataFrame
        .withColumn(Idx, lit(null).cast("string"))
        .withColumn(Id, lit(null).cast("string"))
        .withColumn(Document, lit(null).cast("string"))
        .withColumn(IsDeleted, lit(false)))
    (IndexerOps.cdcMerge(cur, batch), nIds - nDels, nDels)
  }

  /** J2 — post-sync reconciliation: per-index live counts in the store vs
    * live docs in the source; empty result = consistent. */
  def reconcile(env: DataFrame, indexes: Seq[String]): Seq[(String, Long, Long)] =
    indexes.map { idx =>
      val storeCount = store.count(idx)
      val srcCount = env.where(col(Idx) === idx && !col(IsDeleted)).count()
      (idx, storeCount, srcCount)
    }.filter { case (_, a, b) => a != b }

  /** New watermark = max updated_at in the source plus 1 µs (data-driven —
    * the deterministic analog of the reference's run-timestamp watermark,
    * which is always strictly later than every processed row; without the
    * bump the inclusive `>=` scan reprocesses the boundary row forever). */
  private def saveWatermarkFrom(env: DataFrame): Unit = {
    val row = env.agg(date_format(
        max(col(UpdatedAt)) + expr("INTERVAL 1 MICROSECOND"),
        "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .collect()(0)
    if (!row.isNullAt(0)) watermarks.save(row.getString(0))
  }
}
