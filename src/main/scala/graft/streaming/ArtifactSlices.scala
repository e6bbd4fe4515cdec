package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Upsert/tombstone resolution for gbatch-keyed artifact slices — the
  * piece that turns the append-only slice convention into the
  * reference's incremental contract (an upstream row is an upsert, or a
  * tombstone when `is_deleted`; cf. reference flows/main_flow.py:366-395
  * where `is_deleted` rows become `_op_type: delete` actions).
  *
  * Every indexing batch writes, besides its per-doc index slices, an
  * `ops` slice `(key, is_deleted)` — the batch's membership record.
  * Resolution is latest-slice-wins: for each key, the row from its
  * maximal `gbatch` is authoritative; a re-emitted key supersedes every
  * earlier slice, and a key whose latest record is a tombstone is
  * screened out entirely. Index slices stay append-only and
  * replay-safe (same-batch overwrite); resolution happens at read.
  *
  * Scale shape: the ops frame is one row per (key, batch) — corpus
  * cardinality, not corpus bytes. [[live]] is a single hash agg keyed
  * on `key`; joining the result back to an index slice frame on
  * `(key, gbatch)` is an equi-join that prunes superseded and deleted
  * rows before any scoring work. */
private[streaming] object ArtifactSlices {

  /** The batch's `is_deleted` column when present, else all-live — the
    * reference envelope carries the flag, plain document streams don't. */
  def deletedCol(batch: DataFrame): Column =
    if (batch.columns.contains("is_deleted")) col("is_deleted").cast("boolean")
    else lit(false)

  /** One membership row per key for a batch: `(key, is_deleted)`.
    * Within a single batch a delete beats an upsert of the same key
    * (micro-batches carry no intra-batch order to honor). */
  def opsOf(batch: DataFrame, key: String): DataFrame =
    batch.select(col(key), deletedCol(batch).as("is_deleted"))
      .groupBy(key).agg(max("is_deleted").as("is_deleted"))

  /** Latest-slice-wins resolution: `(key, gbatch)` of each key's
    * authoritative LIVE slice. The struct max orders by `gbatch` first,
    * so the newest record wins; deleted keys drop out. */
  def live(ops: DataFrame, key: String): DataFrame =
    ops.groupBy(key)
      .agg(max(struct(col("gbatch"), col("is_deleted"))).as("m"))
      .where(!col("m.is_deleted"))
      .select(col(key), col("m.gbatch").as("gbatch"))

  /** Restrict an index slice frame (read with its `gbatch` partition
    * column) to each key's authoritative live slice. */
  def resolve(sliced: DataFrame, ops: DataFrame, key: String): DataFrame =
    sliced.join(live(ops, key), Seq(key, "gbatch")).drop("gbatch")
}
