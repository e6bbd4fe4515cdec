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

/** The gbatch-sliced artifact layout shared by the streaming retrieval
  * indexes: named per-doc frames under `root/<frame>/gbatch=<id>` plus
  * the `ops` membership frame, resolved latest-slice-wins at read, with
  * crash-safe compaction.
  *
  * Compaction: a long-running stream accumulates one slice directory
  * per micro-batch, and serve cost grows with FILE count even though
  * the resolved row count doesn't (the same failure mode the bucketed
  * index hit before `compactIndex`). [[compact]] folds everything at or
  * below the high-water batch id into ONE resolved slice per frame:
  *
  *  1. the resolved live frames are written in full to a fresh
  *     generation directory `compact-<highWater>-<nonce>` (tombstones
  *     drop out entirely, superseded slices are gone);
  *  2. a pointer file `COMPACT` is swapped to the new generation by
  *     atomic rename — the commit point, the [[graft.sync.IndexStore]]
  *     alias convention;
  *  3. superseded slice directories and orphaned generations are
  *     removed best-effort.
  *
  * A crash before (2) leaves the old state fully intact (the unpointed
  * generation is garbage-collected by the next compaction); a crash
  * after (2) only delays cleanup, because reads ignore slices at or
  * below the pointed generation's high-water id. A checkpoint replay of
  * a pre-compaction batch rewrites a slice that reads ignore — replay
  * safety survives compaction. */
private[streaming] final class SlicedArtifact(
    root: String, frames: Seq[String], key: String) {

  private def sliceDir(frame: String, batchId: Long) =
    s"$root/$frame/gbatch=$batchId"
  private val pointer = java.nio.file.Paths.get(root, "COMPACT")

  /** Publish one batch's slice of one frame (overwrite = replay-safe). */
  def writeSlice(df: DataFrame, frame: String, batchId: Long): Unit =
    df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(sliceDir(frame, batchId))

  /** The pointed compacted generation and its high-water batch id. */
  private def compactedGen(): Option[(String, Long)] =
    if (!java.nio.file.Files.exists(pointer)) None
    else {
      val gen = java.nio.file.Files.readString(pointer).trim
      // dir name carries the high-water id: compact-<highWater>-<nonce>
      val hw = gen.split("-")(1).toLong
      Some((s"$root/$gen", hw))
    }

  private def sliceIds(frame: String): Seq[Long] = {
    val d = new java.io.File(s"$root/$frame")
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("gbatch="))
      .map(_.stripPrefix("gbatch=").toLong)
  }

  /** One frame, gbatch column attached: the compacted base (if any)
    * unioned with the strictly-newer live slices. None before any
    * write. */
  private def frameWithBatches(spark: org.apache.spark.sql.SparkSession,
      frame: String): Option[DataFrame] = {
    val base = compactedGen()
    val hw = base.map(_._2).getOrElse(Long.MinValue)
    val newer = sliceIds(frame).filter(_ > hw)
    val parts =
      // partition-value inference types gbatch as INT; slices attach it
      // as a long literal — cast so the union lines up
      base.map { case (dir, _) => spark.read.parquet(s"$dir/$frame")
        .withColumn("gbatch", col("gbatch").cast("long")) }.toSeq ++
      (if (newer.nonEmpty)
        Seq(newer.map(b => spark.read.parquet(sliceDir(frame, b))
          .withColumn("gbatch", lit(b)))
          .reduce(_.unionByName(_)))
      else Seq.empty)
    parts.reduceOption(_.unionByName(_))
  }

  /** All frames resolved to the live corpus (latest slice per key wins,
    * tombstoned keys screened), or None before any batch wrote. */
  def resolved(spark: org.apache.spark.sql.SparkSession): Option[Map[String, DataFrame]] =
    frameWithBatches(spark, "ops").map { ops =>
      frames.map(f => f ->
        ArtifactSlices.resolve(frameWithBatches(spark, f).get, ops, key)).toMap
    }

  /** Fold every slice at or below the current high-water batch id into
    * one resolved generation; returns the high-water id, or -1 when
    * there is nothing to compact. `numFiles` sizes the compacted
    * output — 1 is right for a test artifact; at corpus scale pass a
    * count that keeps file sizes near the block size. */
  def compact(spark: org.apache.spark.sql.SparkSession, numFiles: Int = 1): Long = {
    val opsAll = frameWithBatches(spark, "ops").getOrElse(return -1L)
    val hw = (compactedGen().map(_._2).toSeq ++ sliceIds("ops")) match {
      case Seq() => return -1L
      case ids => ids.max
    }
    val gen = s"compact-$hw-${System.nanoTime()}"
    val liveKeys = ArtifactSlices.live(opsAll, key)
    frames.foreach { f =>
      ArtifactSlices.resolve(frameWithBatches(spark, f).get, opsAll, key)
        .coalesce(numFiles).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$root/$gen/$f/gbatch=$hw")
    }
    liveKeys.select(col(key), lit(false).as("is_deleted"))
      .coalesce(numFiles).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/$gen/ops/gbatch=$hw")
    // commit point: atomic pointer rename
    val tmp = java.nio.file.Paths.get(root, s".COMPACT.tmp-${System.nanoTime()}")
    java.nio.file.Files.writeString(tmp, gen)
    java.nio.file.Files.move(tmp, pointer,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // best-effort cleanup: superseded slices and unpointed generations
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    (frames :+ "ops").foreach { f =>
      sliceIds(f).filter(_ <= hw)
        .foreach(b => rm(new java.io.File(sliceDir(f, b))))
    }
    Option(new java.io.File(root).listFiles()).foreach(_.foreach { f =>
      if (f.getName.startsWith("compact-") && f.getName != gen) rm(f)
    })
    hw
  }
}
