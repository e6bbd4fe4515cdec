package graft.streaming

import graft.operators.VectorOps
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming semantic dedup: screen an embedding stream against a
  * GROWING accepted-representative artifact — SemDeDup for the crawl as
  * it arrives, the embedding-space member of the streaming-curation
  * family ([[StreamingDedup]] = lexical MinHash, [[StreamingSubstring]]
  * = verbatim spans). Each micro-batch:
  *
  *  1. buckets its own vectors (map-only LSH signature);
  *  2. confirms near-dups against the accepted representatives via
  *     [[VectorOps.crossEmbeddingNearDups]] (bucket equi-join against
  *     the reps artifact — corpus embeddings are read, never
  *     re-bucket-joined among themselves) and within the batch via
  *     [[VectorOps.embeddingNearDups]];
  *  3. appends verdicts `(vec_id, dup_of, cosine, accepted)` and the
  *     ACCEPTED vectors to the reps artifact, so later batches dedup
  *     against everything accepted before them.
  *
  * Semantics: greedy-sequential curation in arrival order — a vector is
  * accepted iff it cosine-matches neither a previously ACCEPTED
  * representative nor any lower-vec_id vector of its own batch. Unlike
  * [[VectorOps.semanticDedupIncremental]] (which reproduces the batch
  * closure exactly, merging old clusters when a bridging vector
  * arrives), the online policy never revisits an accept — the
  * curation-in-arrival-order trade every streaming ingest makes, and
  * the same one [[StreamingDedup]] documents for the lexical family.
  * The spec pins equivalence to a slice-by-slice batch replay of the
  * same policy.
  *
  * Mechanics mirror [[StreamingDedup]]: `foreachBatch` (candidate
  * generation needs batch joins), per-batch `gbatch=<id>` overwrite
  * slices plus strictly-earlier-slice corpus reads (checkpoint-replay
  * safe — a replayed batch re-screens against exactly the state it
  * originally saw), state in the artifact directory — executor memory
  * flat at any stream length, and the artifact is the ordinary
  * `(vec_id, embedding)` frame any batch pipeline reads.
  *
  * Cost caveat: within-batch pairs run over the RAW batch (verdict rows
  * are per-vector, so the exact-collapse trick the batch/incremental
  * paths use does not apply directly); m identical vectors in ONE
  * micro-batch cost m²/2 within-bucket pairs — bounded by the
  * micro-batch size, never the corpus. Size triggers accordingly, or
  * pre-collapse upstream if a source emits mass-duplicated embeddings. */
class StreamingSemanticDedup(artifactDir: String, outDir: String,
    minCosine: Double, numPlanes: Int = VectorOps.NumPlanes) {

  private def slice(root: String, batchId: Long) = s"$root/gbatch=$batchId"

  /** Run to completion of available data; returns DISTINCT micro-batches
    * run — a checkpoint replay of an already-seen batchId after a
    * failure re-invokes `foreachBatch` but must not double-count. */
  def screenAvailable(spark: SparkSession, embStream: DataFrame,
      checkpoint: String): Long = {
    val seen = scala.collection.mutable.Set.empty[Long]
    val q = embStream.writeStream
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
    val vecs = batch.select("vec_id", "embedding").persist()
    try {
      // best match per batch vector, deterministic on ties: max cosine,
      // then LOWEST partner id (max of struct(cosine, -partner))
      def best(cands: DataFrame): DataFrame = cands
        .groupBy("vec_id")
        .agg(max(struct(col("cosine"), (-col("dup_cand")).as("nid"))).as("m"))
        .select(col("vec_id"), (-col("m.nid")).as("dup_of"),
          col("m.cosine").as("cosine"))
      val corpusDup = corpusReps(spark, batchId) match {
        case Some(reps) =>
          best(VectorOps.crossEmbeddingNearDups(vecs, reps, minCosine, numPlanes)
            .select(col("vec_a").as("vec_id"), col("vec_b").as("dup_cand"),
              col("cosine")))
        case None => spark.emptyDataFrame
          .withColumn("vec_id", lit(0L)).withColumn("dup_of", lit(0L))
          .withColumn("cosine", lit(0.0)).limit(0)
      }
      // within-batch: drop the higher id of every confirmed pair
      val innerDup = best(VectorOps.embeddingNearDups(vecs, minCosine, numPlanes)
        .select(col("vec_b").as("vec_id"), col("vec_a").as("dup_cand"),
          col("cosine")))
      val dups = corpusDup.unionByName(innerDup)
        .groupBy("vec_id")
        .agg(max(struct(col("cosine"), (-col("dup_of")).as("nid"))).as("m"))
        .select(col("vec_id"), (-col("m.nid")).as("dup_of"),
          col("m.cosine").as("cosine"))
      val verdicts = vecs.select("vec_id")
        .join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), col("dup_of"), col("cosine"),
          col("dup_of").isNull.as("accepted"))
        .persist()
      try {
        verdicts.write.mode(SaveMode.Overwrite).parquet(slice(outDir, batchId))
        vecs.join(verdicts.where(col("accepted")).select("vec_id"), "vec_id")
          .write.mode(SaveMode.Overwrite)
          .parquet(slice(s"$artifactDir/reps", batchId))
      } finally verdicts.unpersist()
    } finally vecs.unpersist()
  }

  /** The accepted-representative artifact accumulated by batches BEFORE
    * `batchId` (None before any wrote it). Strictly-earlier slices only:
    * a checkpoint replay of batch N re-screens against exactly the state
    * it originally saw — reading N's own leftover slice would make every
    * replayed vector self-match at cosine 1.0 and flip to rejected. */
  private def corpusReps(spark: SparkSession, batchId: Long): Option[DataFrame] = {
    val d = new java.io.File(s"$artifactDir/reps")
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
