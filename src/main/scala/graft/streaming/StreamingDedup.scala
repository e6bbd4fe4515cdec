package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming incremental dedup: screen a document stream against a
  * GROWING corpus signature artifact — the "dedup the crawl as it
  * arrives" path of incremental curation. Each micro-batch:
  *
  *  1. computes its own shingle/signature frames (map-only kernels);
  *  2. confirms near-dups against the corpus artifact via
  *     [[Dedup.crossCorpusPairs]] (band equi-join — the batch never
  *     scans corpus text, only its signature/shingle artifacts) and
  *     within the batch itself via [[Dedup.nearDupPairsFrom]];
  *  3. appends verdicts `(doc_id, dup_of, jaccard, accepted)` to the
  *     output, and appends the ACCEPTED docs' signature+shingle rows to
  *     the artifact — so later batches dedup against everything accepted
  *     before them.
  *
  * Semantics: greedy-sequential curation in arrival order (the online
  * policy a streaming ingest actually runs): a doc is accepted iff it
  * near-duplicates neither a previously ACCEPTED doc nor any
  * lower-doc_id doc of its own batch (the pairwise drop list, matching
  * [[Dedup.nearDupDedup]]'s within-corpus policy). The spec pins
  * equivalence to an explicit slice-by-slice batch replay of the same
  * policy.
  *
  * Mechanics: `foreachBatch`, because candidate generation needs batch
  * operators (`distinct`, anti-joins) that append-mode streaming can't
  * express statelessly — the same pattern as [[StreamingCdc]]. All
  * per-batch writes land in `gbatch=<id>` partition subdirs with
  * overwrite semantics, so a replayed batch rewrites its own slice
  * instead of duplicating artifact rows (checkpoint-resume safe). State
  * lives in the artifact directory, not the state store — executor
  * memory is flat at any stream length, and the artifact is the same
  * portable frame [[Dedup.minHashSignatures]] produces for batch
  * pipelines.
  */
class StreamingDedup(artifactDir: String, outDir: String,
    minJaccard: Double,
    // reliable-checkpoint dir for the band-frame materializations inside
    // [[Dedup.crossCorpusPairs]]/[[Dedup.nearDupPairsFrom]] (default:
    // executor-local blocks — set on a real cluster so a lost executor
    // can't kill a long screen; the [[StreamingSubstring]] convention)
    reliableCheckpointDir: Option[String] = None) {

  private def slice(root: String, batchId: Long) = s"$root/gbatch=$batchId"

  /** Run to completion of available data; returns DISTINCT micro-batches
    * run — a checkpoint replay of an already-seen batchId after a
    * failure re-invokes `foreachBatch` but must not double-count. */
  def screenAvailable(spark: SparkSession, docsStream: DataFrame,
      checkpoint: String, maxFilesPerTrigger: Int = 1): Long = {
    val seen = scala.collection.mutable.Set.empty[Long]
    val q = docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        screenBatch(batch, batchId)
        seen.synchronized { seen += batchId; () }
      }
      .start()
    q.awaitTermination()
    seen.size.toLong
  }

  /** One micro-batch of the greedy-sequential policy (also the unit the
    * spec replays in batch mode). */
  private[graft] def screenBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val docs = batch.select("doc_id", "text").persist()
    try {
      val sh = Dedup.shingleFrame(docs).persist()
      val sigs = Dedup.minHashSignaturesFrom(sh).persist()
      try {
        // best match per batch doc, deterministic on ties: max jaccard,
        // then LOWEST partner id (max of struct(jaccard, -partner))
        def best(pairs: DataFrame): DataFrame = pairs
          .groupBy(col("doc_b").as("doc_id"))
          .agg(max(struct(col("jaccard"), (-col("doc_a")).as("nid"))).as("m"))
          .select(col("doc_id"), (-col("m.nid")).as("dup_of"),
            col("m.jaccard").as("jaccard"))
        // vs the accepted corpus so far (empty on the first batch)
        val corpusDup = corpusSigs(spark, batchId) match {
          case Some((cSigs, cSh)) =>
            best(Dedup.crossCorpusPairs(cSigs, cSh, sigs, sh, minJaccard,
              reliableCheckpointDir))
          case None => spark.emptyDataFrame
            .withColumn("doc_id", lit(0L)).withColumn("dup_of", lit(0L))
            .withColumn("jaccard", lit(0.0)).limit(0)
        }
        // within-batch: drop the higher id of every confirmed pair
        val innerDup = best(Dedup.nearDupPairsFrom(sigs, sh, minJaccard,
          reliableCheckpointDir))
        val dups = corpusDup.unionByName(innerDup)
          .groupBy("doc_id")
          .agg(max(struct(col("jaccard"), (-col("dup_of")).as("nid"))).as("m"))
          .select(col("doc_id"), (-col("m.nid")).as("dup_of"),
            col("m.jaccard").as("jaccard"))
        val verdicts = docs.select("doc_id")
          .join(dups, Seq("doc_id"), "left")
          .select(col("doc_id"), col("dup_of"), col("jaccard"),
            col("dup_of").isNull.as("accepted"))
          .persist()
        try {
          verdicts.write.mode(SaveMode.Overwrite).parquet(slice(outDir, batchId))
          val accepted = verdicts.where(col("accepted")).select("doc_id")
          sigs.join(accepted, "doc_id").write.mode(SaveMode.Overwrite)
            .parquet(slice(s"$artifactDir/sigs", batchId))
          sh.join(accepted, "doc_id").write.mode(SaveMode.Overwrite)
            .parquet(slice(s"$artifactDir/sh", batchId))
        } finally verdicts.unpersist()
      } finally { sigs.unpersist(); sh.unpersist() }
    } finally docs.unpersist()
  }

  /** The accepted-corpus artifact accumulated by batches BEFORE
    * `batchId` (None before any wrote it). Strictly-earlier slices only:
    * a checkpoint replay of batch N must re-screen against exactly the
    * state it originally saw — reading N's own leftover slice would make
    * every replayed doc self-match at jaccard 1.0 and flip to rejected. */
  private def corpusSigs(spark: SparkSession,
      batchId: Long): Option[(DataFrame, DataFrame)] = {
    val sigsDir = new java.io.File(s"$artifactDir/sigs")
    val shDir = new java.io.File(s"$artifactDir/sh")
    if (!sigsDir.isDirectory || !shDir.isDirectory) None
    else Some((
      spark.read.parquet(sigsDir.toString)
        .where(col("gbatch") < batchId).drop("gbatch"),
      spark.read.parquet(shDir.toString)
        .where(col("gbatch") < batchId).drop("gbatch")))
  }

  /** All verdicts written so far. */
  def verdicts(spark: SparkSession): Option[DataFrame] = {
    val d = new java.io.File(outDir)
    if (!d.isDirectory) None
    else Some(spark.read.parquet(outDir).drop("gbatch"))
  }
}
