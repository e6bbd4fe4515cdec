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

private[streaming] object SliceIngest {
  /** The shared `AvailableNow`/`foreachBatch` ingest driver every
    * sliced-artifact index uses (lexical, vector, phash): run
    * `indexBatch` per micro-batch against the checkpoint, return the
    * count of DISTINCT batches run (replays re-invoke `foreachBatch`
    * but must not count twice). One implementation so a fix to the
    * trigger/replay semantics cannot silently diverge per index. */
  def runAvailable(stream: DataFrame, checkpoint: String)(
      indexBatch: (DataFrame, Long) => Unit): Long = {
    val seen = scala.collection.mutable.Set.empty[Long]
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        indexBatch(batch, batchId)
        seen.synchronized { seen += batchId; () }
      }
      .start()
    q.awaitTermination()
    seen.size.toLong
  }
}


private[streaming] object SlicedArtifact {

  /** Pin a digest of an index's FIXED constants (codebooks, merge
    * rules) in the artifact root at first open; refuse any reopen
    * under a different digest. Reopening a slice store with changed
    * constants would silently mix generations across slices — codes
    * under the wrong books, windows under the wrong rules — with no
    * error anywhere; changing constants is a re-index into a fresh
    * dir. Write-if-absent: a pre-guard artifact gets pinned to the
    * FIRST handle that reopens it (the best a digest added after the
    * fact can do — it cannot reconstruct what wrote the old slices).
    *
    * Injectivity: each part enters the digest stream LENGTH-PREFIXED
    * (byte count + ':' + bytes), so two part sequences with the same
    * concatenation but different boundaries — a rule string containing
    * the old NUL separator, a double moved across a section boundary —
    * hash differently; [[section]] additionally leads each constant
    * group with its label and shape counts so structurally different
    * configurations with coinciding flat values cannot alias.
    *
    * Crash/race safety: the first pin stages the digest to a dot-tmp
    * sibling and commits it as a hard LINK — atomic, and unlike a
    * POSIX rename it FAILS if the file already exists — so no reader
    * ever sees a truncated digest, an installed pin can never be
    * silently replaced, and of two concurrent first-opens under
    * DIFFERENT constants exactly the loser of the link race falls
    * through to the compare and refuses (both proceeding is the
    * generation mix this guard exists to stop). A stored value that
    * is not 64 hex chars is reported as corruption, not as a
    * constants mismatch. */
  def pinConstants(root: String, parts: Iterator[String],
      what: String, fileName: String = "CONSTANTS"): Unit = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach { s =>
      val bytes = s.getBytes("UTF-8")
      md.update(s"${bytes.length}:".getBytes("UTF-8"))
      md.update(bytes)
    }
    val digest = md.digest().map("%02x".format(_)).mkString
    val f = java.nio.file.Paths.get(root, fileName)
    if (!java.nio.file.Files.exists(f)) {
      java.nio.file.Files.createDirectories(f.getParent)
      // nanoTime alone can collide across concurrent first-opens (a
      // shared tmp inode would let the loser rewrite the winner's
      // already-linked content) — the thread id disambiguates
      val tmp = f.resolveSibling(s".$fileName.tmp-${System.nanoTime()}" +
        s"-${Thread.currentThread().getId}")
      java.nio.file.Files.writeString(tmp, digest)
      try java.nio.file.Files.createLink(f, tmp)
      catch {
        // lost a concurrent first-pin race: the winner's digest is in
        // place — fall through to the compare below, like any reopen
        case _: java.nio.file.FileAlreadyExistsException => ()
      } finally {
        java.nio.file.Files.deleteIfExists(tmp); ()
      }
    }
    val stored = java.nio.file.Files.readString(f).trim
    require(stored.matches("[0-9a-f]{64}"),
      s"constants digest file $f is corrupt (not a SHA-256 hex string: " +
        s"'$stored') — a crashed pre-guard writer or manual edit; " +
        "delete the file to re-pin this handle's constants, after " +
        "confirming the slices were written under them")
    require(stored == digest,
      s"artifact at $root was written under different $what (stored " +
        s"constants digest $stored, this handle $digest) — reopening " +
        "would mix generations across slices; re-index into a fresh " +
        "artifact dir to change them. (A pin written by a PRE-UPGRADE " +
        "digest scheme reports the same way: after confirming the " +
        "constants are in fact unchanged, delete the file to re-pin " +
        "under the current scheme.)")
  }

  /** A labeled, shape-prefixed constant group for [[pinConstants]]:
    * the group's label, its shape counts (e.g. number of rules; cells
    * × dims; books × sub-centroids × dims), then the parts. Distinct
    * configurations whose flat part streams coincide (a value moved
    * across a group boundary, different row shapes over the same flat
    * values) get distinct digests because the labels and counts
    * disagree. */
  def section(label: String, shape: Seq[Int],
      parts: Iterator[String]): Iterator[String] =
    Iterator(s"#$label", shape.mkString("x")) ++ parts

  /** [[pinConstants]] part stream for nested double structures —
    * IEEE-754 bit patterns, order-preserving. */
  def doubleParts(dss: Seq[Double]*): Iterator[String] =
    dss.iterator.flatMap(_.iterator)
      .map(d => java.lang.Double.doubleToLongBits(d).toString)
  /** Default retention for dirs superseded by a compaction pointer
    * swap. A reader that resolved its frames just BEFORE the swap still
    * holds plans referencing the old generation + slice paths; deleting
    * them at the swap would fail that read mid-union
    * ([[graft.sync.IndexStore.cleanupStaleStages]]'s grace convention,
    * applied to supersession: age is measured from the swap that made a
    * dir garbage, not from the dir's mtime, because a months-old slice
    * can be superseded a millisecond before being read). */
  val CompactionGraceMs: Long = 10L * 60L * 1000L
}

/** Pointer-committed compaction for the FOLD-style slice roots — the
  * [[SlicedArtifact]] generation/pointer protocol applied to the bloom
  * chains' state dirs, whose resolution is an algebraic FOLD (bit OR,
  * count SUM, key-delta SUM) instead of latest-slice-wins. A
  * long-running screen stream accumulates one slice per micro-batch
  * and every batch's state read folds them ALL — read cost grows
  * linearly with batch count even though the folded row count doesn't.
  * [[compact]] folds every slice at or below an absorb watermark into
  * ONE generation directory and commits it by atomic pointer rename;
  * [[scoped]] reads resolve base-plus-newer-slices thereafter.
  *
  * REPLAY SAFETY is the one extra constraint latest-wins never had:
  * a SUM cannot exclude an absorbed slice the way latest-wins ignores
  * a superseded one, so a replayed batch whose own slice was folded in
  * would double-count itself. The caller must therefore absorb only
  * batches that can no longer replay — structured streaming commits
  * batches in order, so everything STRICTLY BELOW the newest written
  * slice is final (only the newest can be uncommitted) and `upTo =
  * newestId − 1` is always safe. [[scoped]] REFUSES a replay view at
  * or below the committed high-water rather than serving it wrong.
  *
  * Crash contract (the [[SlicedArtifact]] one): a crash before the
  * pointer swap leaves the old state fully intact; after the swap,
  * only cleanup is delayed — garbage is derived STRUCTURALLY at each
  * compaction (everything at or below the pointed high-water, plus
  * every unpointed generation) and reclaimed past a `_STALE` grace
  * window, so a crash in ANY prior window (orphan generation, or
  * swap-landed-but-log-append-lost) heals on the next compaction and
  * a reader that resolved just before a swap never loses files
  * mid-union. Pointer and log are underscore-named, generations
  * dot-named: parquet partition discovery over the live `gbatch=`
  * slices skips both.
  *
  * DELIBERATELY a sibling of — not shared with —
  * [[SlicedArtifact]]'s pointer/stale machinery: that store resolves
  * latest-wins over named frames and appends (re-stamping) to its
  * log, this one resolves an algebraic fold over one root and
  * path-dedupes its log so healed entries keep their original grace
  * clock. A fix to either protocol should be checked against the
  * other. */
private[streaming] object FoldCompaction {

  private def pointer(root: String) =
    java.nio.file.Paths.get(root, "_COMPACT")
  private def staleLog(root: String) =
    java.nio.file.Paths.get(root, "_STALE")

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(); ()
  }

  /** ALL slice ids with a dir on disk — including absorbed ones whose
    * deferred reclaim has not run yet. */
  def sliceIds(root: String): Seq[Long] = {
    val d = new java.io.File(root)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("gbatch="))
      .map(_.stripPrefix("gbatch=").toLong)
  }

  /** UN-ABSORBED slice count — ids strictly above the pointed
    * high-water. THE compaction-trigger meter: counting raw dirs
    * ([[sliceIds]]) would keep re-triggering for the whole grace
    * window after a compaction (absorbed dirs linger until the
    * deferred sweep), degenerating the once-per-budget fold into a
    * full-state rewrite EVERY batch. */
  def liveSliceCount(root: String): Int = {
    val hw = gen(root).map(_._2).getOrElse(Long.MinValue)
    sliceIds(root).count(_ > hw)
  }

  /** The pointed generation (absolute dir, high-water id), if any. */
  def gen(root: String): Option[(String, Long)] =
    if (!java.nio.file.Files.exists(pointer(root))) None
    else {
      val g = java.nio.file.Files.readString(pointer(root)).trim
      // dot-dir name carries the high-water id: .gen_<hw>_<pid>_<nonce>
      // (underscore-separated so a NEGATIVE hw — an absorbed inherited
      // gbatch=-1 slice — parses)
      Some((s"$root/$g", g.split("_")(1).toLong))
    }

  /** The root's raw rows for a fold: the pointed generation (when one
    * exists) unioned with the slices strictly above its high-water —
    * restricted to strictly below `before` for a replay view. None
    * before anything was written. The `before ≤ high-water` refusal is
    * the replay-safety contract made loud: such a view can no longer
    * be served exactly (its evidence is folded in), and by the
    * in-order commit rule it can never legitimately be asked for. */
  def scoped(spark: org.apache.spark.sql.SparkSession, root: String,
      before: Option[Long]): Option[DataFrame] = {
    val base = gen(root)
    val hw = base.map(_._2).getOrElse(Long.MinValue)
    before.foreach(b => require(b > hw,
      s"replay view at batch $b is at or below $root's compaction " +
        s"high-water $hw — compaction must only absorb batches that " +
        "can no longer replay (absorb ≤ newest − 1)"))
    val newer = sliceIds(root).filter(i => i > hw && before.forall(i < _))
    val parts =
      base.map { case (dir, _) => spark.read.parquet(dir) }.toSeq ++
      (if (newer.isEmpty) Seq.empty
      else Seq(spark.read.parquet(root)
        .where(col("gbatch") > hw &&
          before.map(b => col("gbatch") < b).getOrElse(lit(true)))
        .drop("gbatch")))
    parts.reduceOption(_.unionByName(_))
  }

  /** Fold every slice at or below `upTo` (plus the current base) into
    * a fresh pointed generation; returns the new high-water (the old
    * one when nothing new absorbs). `fold` is the root's algebra —
    * it must satisfy fold(a ∪ b) = fold(fold(a) ∪ b), the property
    * that makes base-plus-newer reads exact. */
  def compact(spark: org.apache.spark.sql.SparkSession, root: String,
      upTo: Long, fold: DataFrame => DataFrame, numFiles: Int = 1,
      graceMs: Long = SlicedArtifact.CompactionGraceMs): Long = {
    val base = gen(root)
    val hw0 = base.map(_._2).getOrElse(Long.MinValue)
    val absorb = sliceIds(root).filter(i => i > hw0 && i <= upTo)
    if (absorb.isEmpty) return hw0
    val hw = absorb.max
    val parts =
      base.map { case (dir, _) => spark.read.parquet(dir) }.toSeq :+
      spark.read.parquet(root)
        .where(col("gbatch") > hw0 && col("gbatch") <= upTo)
        .drop("gbatch")
    val genName = s".gen_${hw}_${ProcessHandle.current().pid()}_" +
      s"${System.nanoTime()}"
    fold(parts.reduce(_.unionByName(_))).coalesce(numFiles)
      .write.parquet(s"$root/$genName")
    // commit point: atomic pointer rename
    val tmp = java.nio.file.Paths.get(root,
      s"._COMPACT.tmp-${System.nanoTime()}")
    java.nio.file.Files.writeString(tmp, genName)
    java.nio.file.Files.move(tmp, pointer(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // deferred cleanup, on the STORE's clock (the pointer's mtime —
    // the SlicedArtifact convention). Garbage is derived
    // STRUCTURALLY, not just from what this call absorbed: everything
    // at or below the pointed high-water plus every unpointed
    // generation is superseded BY DEFINITION, so a crash in a prior
    // compaction's window — after its generation write but before its
    // pointer swap (orphan gen), or after the swap but before its log
    // append (unlogged absorbed slices) — heals on the next
    // compaction instead of leaking full-state copies forever. The
    // log dedupes by path so healed entries aren't re-stamped (which
    // would reset their grace clock every compaction).
    val now = java.nio.file.Files
      .getLastModifiedTime(pointer(root)).toMillis
    val priorLog =
      if (!java.nio.file.Files.exists(staleLog(root))) Seq.empty[String]
      else java.nio.file.Files.readString(staleLog(root))
        .split("\n").toSeq.filter(_.nonEmpty)
    val logged = priorLog.map(_.split("\t")(1)).toSet
    val superseded =
      (sliceIds(root).filter(_ <= hw)
        .map(b => new java.io.File(s"$root/gbatch=$b")) ++
      Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty[java.io.File]).toSeq
        .filter(f => f.isDirectory && f.getName.startsWith(".gen_") &&
          f.getName != genName))
        .filterNot(d => logged.contains(d.getAbsolutePath))
    val entries = priorLog ++
      superseded.map(d => s"$now\t${d.getAbsolutePath}")
    val cutoff = now - graceMs
    val (due, kept) = entries.partition(_.split("\t")(0).toLong <= cutoff)
    due.foreach(l => rm(new java.io.File(l.split("\t")(1))))
    val tmp2 = java.nio.file.Paths.get(root,
      s"._STALE.tmp-${System.nanoTime()}")
    java.nio.file.Files.writeString(tmp2, kept.map(_ + "\n").mkString)
    java.nio.file.Files.move(tmp2, staleLog(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    hw
  }
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
  // deferred-deletion log: one "<supersededAtMillis>\t<path>" line per
  // dir a pointer swap made garbage; swept once past the grace window
  private val staleLog = java.nio.file.Paths.get(root, "STALE")

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(); ()
  }

  /** The STORE's clock: the pointer file's mtime as the filesystem
    * reports it. Supersession stamps and the sweep cutoff both read
    * THIS clock, never `System.currentTimeMillis()` — so the grace
    * window holds even when the sweeping writer is a different node
    * with a skewed wall clock (the compaction sweep's single-writer
    * CLOCK assumption made structural: whichever writer swaps or
    * sweeps, all times are mtimes the one shared store assigned). */
  private def storeNow(): Long =
    java.nio.file.Files.getLastModifiedTime(pointer).toMillis

  /** Record newly superseded dirs for deferred deletion (single-writer
    * stream: appends don't race). Stamped with the store clock — the
    * pointer was just swapped, so its mtime IS this supersession's
    * time as the store measured it. */
  private def markStale(dirs: Seq[java.io.File]): Unit =
    if (dirs.nonEmpty) {
      val now = storeNow()
      val lines = dirs.map(d => s"$now\t${d.getAbsolutePath}\n").mkString
      java.nio.file.Files.writeString(staleLog, lines,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      ()
    }

  /** Delete logged dirs whose supersession age exceeds the grace;
    * rewrite the log with the survivors (temp + atomic move). Age is
    * store-relative: newest-swap mtime minus the entry's swap-time
    * mtime, both assigned by the store's own filesystem — graceMs = 0
    * still deletes the just-logged entries eagerly (stamp == cutoff
    * base), the behavior the replay spec pins. */
  private def sweepStale(graceMs: Long): Unit =
    if (java.nio.file.Files.exists(staleLog)) {
      val cutoff = storeNow() - graceMs
      val (due, kept) = java.nio.file.Files.readString(staleLog)
        .split("\n").toSeq.filter(_.nonEmpty)
        .partition(_.split("\t")(0).toLong <= cutoff)
      due.foreach(l => rm(new java.io.File(l.split("\t")(1))))
      val tmp = java.nio.file.Paths.get(root, s".STALE.tmp-${System.nanoTime()}")
      java.nio.file.Files.writeString(tmp,
        kept.map(_ + "\n").mkString)
      java.nio.file.Files.move(tmp, staleLog,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }

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

  /** Batch ids that have a slice for `ref` but none for `frame`, plus
    * `-1` when the pointed compacted generation lacks `frame`'s fold —
    * the reopen-with-more-frames hazard: an artifact written before
    * `frame` existed resolves a `frame` frame that silently misses
    * every pre-existing key while `ref` still carries them. */
  private[streaming] def missingFor(ref: String, frame: String): Seq[Long] = {
    val base = compactedGen()
    val hw = base.map(_._2).getOrElse(Long.MinValue)
    val missingBase = base.toSeq.collect {
      case (dir, _) if !new java.io.File(s"$dir/$frame").isDirectory => -1L
    }
    val newer = sliceIds(ref).filter(_ > hw).toSet -- sliceIds(frame).toSet
    missingBase ++ newer.toSeq.sorted
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
  def compact(spark: org.apache.spark.sql.SparkSession, numFiles: Int = 1,
      graceMs: Long = SlicedArtifact.CompactionGraceMs): Long = {
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
    // deferred cleanup: the swap just made the superseded slices and
    // unpointed generations garbage, but a reader that resolved BEFORE
    // the swap may still be mid-union over them — log them stale now,
    // delete them only once a grace window has passed (each compaction
    // sweeps what earlier swaps logged; graceMs = 0 deletes on the next
    // line, the eager behavior the replay spec pins)
    val superseded =
      (frames :+ "ops").flatMap(f => sliceIds(f).filter(_ <= hw)
        .map(b => new java.io.File(sliceDir(f, b)))) ++
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("compact-") && f.getName != gen)
    markStale(superseded)
    sweepStale(graceMs)
    hw
  }
}
