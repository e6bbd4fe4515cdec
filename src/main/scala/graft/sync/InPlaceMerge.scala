package graft.sync

import graft.operators.IndexerOps
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions.col

/** Shared delta-proportional merge step: apply a CDC batch to a BUCKETED
  * physical index, rewriting only the id-hash bucket partitions the
  * batch touches (see IndexStore.replaceBuckets for the swap protocol).
  * Used by both the batch pipeline (SyncPipeline.incrementalSyncInPlace)
  * and the streaming path (StreamingCdc in bucketed mode). Returns
  * (upserts, deletes) observed on the merge action itself. */
object InPlaceMerge {

  /** Batch-context merge with (upserts, deletes) tallies observed on
    * the merge action. NOT for streaming: `Observation` metrics never
    * materialize for actions run inside a `foreachBatch`, so `obs.get`
    * would block forever — use [[applyUnobserved]] there. */
  def apply(store: IndexStore, physical: String, batch: DataFrame,
      buckets: Int): (Long, Long) = {
    val obs = new Observation(s"graft_inplace_${System.nanoTime()}")
    run(store, physical, batch, buckets, Some(obs))
    val m = obs.get
    if (m.contains("batch_ids")) {
      val nIds = m("batch_ids").asInstanceOf[Long]
      val nDels = m("batch_deletes").asInstanceOf[Long]
      (nIds - nDels, nDels)
    } else {
      // AQE empty-relation propagation can prune the observed subtree
      // when the merged output is empty (e.g. every doc tombstoned) —
      // fall back to one explicit tally aggregate over the batch
      import org.apache.spark.sql.functions.{count, lit, max_by, struct, sum, when}
      val r = batch.groupBy(Id)
        .agg(max_by(struct(col(IsDeleted)), col(UpdatedAt)).as("s"))
        .agg(count(lit(1)).as("ids"),
          sum(when(col("s.is_deleted"), 1L).otherwise(0L)).as("dels"))
        .collect()(0)
      val nIds = if (r.isNullAt(0)) 0L else r.getLong(0)
      val nDels = if (r.isNullAt(1)) 0L else r.getLong(1)
      (nIds - nDels, nDels)
    }
  }

  /** Streaming-context merge: same plan, no observation. */
  def applyUnobserved(store: IndexStore, physical: String, batch: DataFrame,
      buckets: Int): Unit =
    run(store, physical, batch, buckets, None)

  private def run(store: IndexStore, physical: String, batch: DataFrame,
      buckets: Int, obs: Option[Observation]): Unit = {
    // the index's own metadata wins over the caller's count: after a
    // bucket re-scale a stale caller value would place rows in buckets
    // the layout doesn't have and un-prune every merge read
    val n = store.bucketCountOf(physical).getOrElse(buckets)
    val withBucket = batch.withColumn(store.BucketKey, store.bucketExpr(Id, n))
    val affected = withBucket.select(store.BucketKey).distinct()
      .collect().map(_.getLong(0)).toSeq
    val cur =
      if (!store.hasData(physical)) None
      else Some(store.readPhysical(physical)
        .where(col(store.BucketKey).isin(affected: _*)) // partition pruning
        .select(Idx, Id, Document, IsDeleted))
    val current = cur.getOrElse(IndexerOps.emptyEnvelope(batch.sparkSession))
    val merged = obs match {
      case Some(o) => IndexerOps.cdcMergeObserved(current, batch, o)
      case None => IndexerOps.cdcMerge(current, batch)
    }
    // repartition by bucket: ONE file per rewritten bucket partition
    // (otherwise every shuffle task holding rows of a bucket writes its
    // own small file — ~32 files per bucket per merge); the extra
    // shuffle moves only the merged delta, and id-sorted rows keep
    // parquet min/max stats tight.
    store.replaceBuckets(physical,
      merged.withColumn(store.BucketKey, store.bucketExpr(Id, n))
        .repartition(col(store.BucketKey))
        .sortWithinPartitions(Id),
      affected)
  }

}
