package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming verbatim-substring screening: screen a document stream
  * against a GROWING accepted-corpus anchor artifact — the ExactSubstr
  * companion of [[StreamingDedup]] (which screens at document
  * granularity via MinHash; this catches docs largely stitched from
  * passages of previously accepted docs, which can sit below any
  * document-level Jaccard threshold). Each micro-batch:
  *
  *  1. computes its own [[Dedup.anchorFrame]] (fused kernel, map-only);
  *  2. finds verbatim extents vs the accepted corpus via
  *     [[Dedup.crossSubstringDups]] (anchor equi-join — the batch never
  *     scans corpus text, only its anchor artifact) and within the
  *     batch itself via [[Dedup.substringDupsFromAnchors]];
  *  3. scores each batch doc's duplicated COVERAGE
  *     ([[Dedup.substringDupStatsFrom]] — interval union, keep-first)
  *     and appends verdicts `(doc_id, dup_frac, accepted)`; accepted
  *     docs' anchor rows join the artifact so later batches screen
  *     against everything accepted before them.
  *
  * Semantics: greedy-sequential in arrival order, the same policy as
  * [[StreamingDedup]] — a doc is rejected iff its text is more than
  * `dropFrac` covered by verbatim spans of previously ACCEPTED docs
  * and/or lower-doc_id docs of its own batch. Spec pins equivalence to
  * a slice-by-slice batch replay.
  *
  * Mechanics identical to [[StreamingDedup]]: `foreachBatch` (candidate
  * generation needs batch operators), per-batch `gbatch=<id>` overwrite
  * slices for checkpoint-replay safety, state IS the artifact directory
  * (flat executor memory at any stream length).
  */
class StreamingSubstring(artifactDir: String, outDir: String,
    dropFrac: Double = Dedup.DupDropFrac,
    // routes the per-batch anchor materialization through a reliable
    // checkpoint (Dedup.materialize): set on a real cluster so a lost
    // executor cannot lose the batch's anchor blocks mid-screen
    reliableCheckpointDir: Option[String] = None) {

  private def slice(root: String, batchId: Long) = s"$root/gbatch=$batchId"

  /** Run to completion of available data; returns DISTINCT micro-batches
    * run — a checkpoint replay of an already-seen batchId after a
    * failure re-invokes `foreachBatch` but must not double-count. */
  def screenAvailable(spark: SparkSession, docsStream: DataFrame,
      checkpoint: String): Long = {
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
  private[streaming] def screenBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val docs = batch.select("doc_id", "text").persist()
    try {
      val anch = Dedup.anchorFrame(docs, // materialized (Dedup.materialize)
        checkpointDir = reliableCheckpointDir)
      val fromCorpus = corpusAnchors(spark, batchId) match {
        case Some(cAnch) => Dedup.crossSubstringDups(cAnch, anch)
        case None => emptyExtents(spark)
      }
      val inner = Dedup.substringDupsFromAnchors(anch)
      val stats = Dedup.substringDupStatsFrom(docs,
        fromCorpus.unionByName(inner), dropFrac)
      val verdicts = docs.select("doc_id")
        .join(stats.select(col("doc_id"), col("dup_frac"), col("dropped")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("dup_frac"), lit(0.0)).as("dup_frac"),
          (!coalesce(col("dropped"), lit(false))).as("accepted"))
        .persist()
      try {
        verdicts.write.mode(SaveMode.Overwrite).parquet(slice(outDir, batchId))
        anch.join(verdicts.where(col("accepted")).select("doc_id"), "doc_id")
          .write.mode(SaveMode.Overwrite)
          .parquet(slice(s"$artifactDir/anchors", batchId))
      } finally verdicts.unpersist()
    } finally docs.unpersist()
  }

  /** Typed zero-row extent frame (first batch has no corpus yet). */
  private def emptyExtents(spark: SparkSession): DataFrame =
    spark.emptyDataFrame
      .withColumn("doc_a", lit(0L)).withColumn("doc_b", lit(0L))
      .withColumn("a_start", lit(0)).withColumn("b_start", lit(0))
      .withColumn("match_len", lit(0L)).limit(0)

  /** The accepted-corpus anchor artifact accumulated by batches BEFORE
    * `batchId`. Strictly-earlier slices only: a checkpoint replay of
    * batch N must re-screen against exactly the state it originally saw
    * — reading N's own leftover slice would score every replayed doc as
    * fully duplicated against itself and reject it. */
  private def corpusAnchors(spark: SparkSession,
      batchId: Long): Option[DataFrame] = {
    val d = new java.io.File(s"$artifactDir/anchors")
    if (!d.isDirectory) None
    else Some(spark.read.parquet(d.toString)
      .where(col("gbatch") < batchId).drop("gbatch"))
  }

  /** All verdicts written so far. */
  def verdicts(spark: SparkSession): Option[DataFrame] = {
    val d = new java.io.File(outDir)
    if (!d.isDirectory) None
    else Some(spark.read.parquet(outDir).drop("gbatch"))
  }
}
