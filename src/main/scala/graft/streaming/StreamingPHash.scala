package graft.streaming

import graft.operators.{ImageAsset, MultimodalOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming perceptual-image index: each micro-batch decodes its
  * image payloads ONCE and appends their aHash slice, so image
  * deduplication serves while the crawl arrives — the pixel-modality
  * sibling of [[StreamingDedup]]'s signature artifact and
  * [[StreamingLexical]]'s tf/dl frames.
  *
  * The decomposition is append-local for the same reason the text
  * artifacts are: a perceptual hash is PER-ASSET local
  * ([[MultimodalOps.imagePHash]] — no corpus statistics anywhere in
  * it), so a batch's slice computed in isolation is bit-identical to
  * that slice within a full-corpus build. The corpus-level view (the
  * duplicate groups) derives at serve time from the resolved artifact
  * through the same [[MultimodalOps.phashDupGroupsFrom]] aggregate the
  * batch path uses — batch/stream equivalence is structural. Decode
  * cost is paid exactly once per asset per crawl, at ingest; no serve
  * ever re-reads image bytes.
  *
  * Upsert/tombstone contract ([[ArtifactSlices]]): a re-crawled asset's
  * new slice supersedes the old hash at serve, `is_deleted = true`
  * screens the asset out; compaction and replay safety are the shared
  * [[SlicedArtifact]] machinery. */
class StreamingPHash(artifactDir: String) {

  private val slices = new SlicedArtifact(artifactDir, Seq("ph"), "asset_id")

  /** Index all available micro-batches of `(asset_id, media
    * [, is_deleted])` rows; returns DISTINCT batches run. */
  def indexAvailable(spark: SparkSession, assetStream: DataFrame,
      checkpoint: String): Long =
    SliceIngest.runAvailable(assetStream, checkpoint)(indexBatch)

  /** One micro-batch: decode + hash the live assets, record the
    * batch's membership ops. */
  private[graft] def indexBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val live = batch.where(!ArtifactSlices.deletedCol(batch))
      .select(col("asset_id"), col("media")).as[ImageAsset]
    slices.writeSlice(MultimodalOps.imagePHash(spark, live).toDF(),
      "ph", batchId)
    slices.writeSlice(ArtifactSlices.opsOf(batch, "asset_id"), "ops", batchId)
  }

  /** The accumulated `(asset_id, width, height, phash)` frame resolved
    * to the LIVE corpus, or None before any batch wrote. */
  def phashes(spark: SparkSession): Option[DataFrame] =
    slices.resolved(spark).map(_("ph"))

  /** Perceptual duplicate groups over the live corpus — the SAME
    * aggregate as batch [[MultimodalOps.phashDupGroups]], so stream ≡
    * batch is structural. */
  def dupGroups(spark: SparkSession): Option[DataFrame] =
    phashes(spark).map(MultimodalOps.phashDupGroupsFrom)

  /** Fold the accumulated slices into one compacted generation
    * ([[SlicedArtifact.compact]]). */
  def compact(spark: SparkSession, numFiles: Int = 1,
      graceMs: Long = SlicedArtifact.CompactionGraceMs): Long =
    slices.compact(spark, numFiles, graceMs)
}
