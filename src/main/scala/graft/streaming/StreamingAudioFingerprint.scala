package graft.streaming

import graft.operators.{AudioAsset, MultimodalOps}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming perceptual-audio index: each micro-batch parses its WAV
  * payloads ONCE and appends their fingerprint slice
  * ([[MultimodalOps.audioFingerprint]] — sign-of-frame-energy-delta
  * bits), so audio deduplication serves while the crawl arrives — the
  * audio-modality twin of [[StreamingPHash]], closing the modality
  * matrix (text, vectors, images, audio all stream into the same
  * slice algebra).
  *
  * Append-local for the [[StreamingPHash]] reason: a perceptual audio
  * fingerprint is PER-ASSET local (no corpus statistics), so a batch's
  * slice computed in isolation is bit-identical to that slice within a
  * full-corpus build. The corpus-level view (duplicate groups) derives
  * at serve time through the same [[MultimodalOps.audioDupGroupsFrom]]
  * window the batch path uses — batch/stream equivalence is
  * structural. Parse cost is paid exactly once per asset per crawl, at
  * ingest; no serve ever re-reads audio bytes.
  *
  * Upsert/tombstone contract ([[ArtifactSlices]]): a re-crawled
  * asset's new slice supersedes the old fingerprint at serve,
  * `is_deleted = true` screens the asset out; compaction and replay
  * safety are the shared [[SlicedArtifact]] machinery. */
class StreamingAudioFingerprint(artifactDir: String) {

  private val slices = new SlicedArtifact(artifactDir, Seq("afp"), "asset_id")

  /** Index all available micro-batches of `(asset_id, media
    * [, is_deleted])` rows; returns DISTINCT batches run. */
  def indexAvailable(spark: SparkSession, assetStream: DataFrame,
      checkpoint: String): Long =
    SliceIngest.runAvailable(assetStream, checkpoint)(indexBatch)

  /** One micro-batch: parse + fingerprint the live assets, record the
    * batch's membership ops. */
  private[graft] def indexBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val live = batch.where(!ArtifactSlices.deletedCol(batch))
      .select(org.apache.spark.sql.functions.col("asset_id"),
        org.apache.spark.sql.functions.col("media")).as[AudioAsset]
    slices.writeSlice(MultimodalOps.audioFingerprint(spark, live).toDF(),
      "afp", batchId)
    slices.writeSlice(ArtifactSlices.opsOf(batch, "asset_id"), "ops", batchId)
  }

  /** The accumulated `(asset_id, n_samples, afp)` frame resolved to
    * the LIVE corpus, or None before any batch wrote. */
  def fingerprints(spark: SparkSession): Option[DataFrame] =
    slices.resolved(spark).map(_("afp"))

  /** Per-asset duplicate-group view over the live corpus — the SAME
    * window as batch [[MultimodalOps.audioDupGroupsFrom]], so stream ≡
    * batch is structural. */
  def dupGroups(spark: SparkSession): Option[DataFrame] =
    fingerprints(spark).map(MultimodalOps.audioDupGroupsFrom)

  /** Fold the accumulated slices into one compacted generation
    * ([[SlicedArtifact.compact]]). */
  def compact(spark: SparkSession, numFiles: Int = 1,
      graceMs: Long = SlicedArtifact.CompactionGraceMs): Long =
    slices.compact(spark, numFiles, graceMs)
}
