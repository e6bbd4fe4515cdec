package graft.streaming

import graft.operators.{HybridOps, TextOps, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the MODEL-CONTEXT-TRUE (v6) chunk frames —
  * the micro-batch twin of [[graft.serve.Retrieval]]'s
  * `bctf`/`bcdl`/`bcindex`/`bcemb` layout, closing the one artifact
  * family that previously had batch rebuild but no streaming path: a
  * crawl feeding a BPE-metered RAG index now gets per-batch slices
  * with the same latest-wins/tombstone algebra as every other index
  * ([[StreamingLexical]], [[StreamingVectorIndex]]).
  *
  * ALL THREE codebooks are fixed constructor arguments — the subword
  * merge `rules` exactly like the coarse `cents` and residual PQ
  * `books`: a stream that re-learned the tokenizer mid-flight would
  * silently move window boundaries (and symbol identities) corpus-wide,
  * the same generation-mixing hazard retraining PQ books mid-stream
  * poses for codes. A deployment changes any of the three with a full
  * re-index (batch [[graft.serve.Retrieval.retrain]]), never by
  * reopening the stream under different constants.
  *
  * Why slices work at the BPE meter: windows derive from a doc's OWN
  * text under the fixed rules, so every frame is per-doc local —
  * subword postings (`bctf`/`bcdl`), the parity chunk vectors
  * (`bcemb`), and their residual codes (`bcivf`) computed for a batch
  * in isolation are bit-identical to those rows within a full-corpus
  * build. Corpus-global score parts (subword df/N/avgdl, probed-cell
  * ranking) derive at serve time from the resolved artifact, exactly
  * like the whitespace twins.
  *
  * Resolution key is the PARENT doc id on every frame (the `civf`
  * convention): a superseded doc's windows all drop together, including
  * tail windows the new version no longer has — composite-key
  * resolution could not retire those. `bcivf`/`bcemb` carry the
  * composite id / chunk_id beside the key for the serve to decompose.
  *
  * Serve paths are the SAME batch functions the snapshot serves with
  * ([[TextOps.bm25ChunkTopKFrom]], [[VectorOps.chunkIvfPqTopKFromIndex]]
  * / `chunkIvfPqRefineTopK`, [[HybridOps]] fusion), with query terms
  * encoded driver-side under the stored rules
  * ([[TextOps.bpeEncodeTerms]]) — streamed ≡ batch is structural, and
  * the spec pins the streamed end state against a batch
  * [[graft.serve.Retrieval.rebuild]] over the same delta. */
class StreamingBpeChunkIndex(artifactDir: String,
    rules: Seq[(String, String)],
    cents: Seq[Seq[Double]],
    books: Seq[Seq[Seq[Double]]]) {

  private val slices = new SlicedArtifact(artifactDir,
    Seq("emb", "bctf", "bcdl", "bcivf", "bcemb"), "doc_id")

  // The "fixed constructor constants" convention made STRUCTURAL: the
  // artifact pins a digest of (rules, cents, books) at first open and
  // every reopen must match — reopening under different constants
  // would silently mix window boundaries / symbol identities / code
  // meanings across slice generations with no error anywhere (the
  // snapshot side persists bperules.txt + the codebooks for exactly
  // this reason; a slice store can pin the digest). Changing any of
  // the three is a full re-index under a fresh artifact dir.
  SlicedArtifact.pinConstants(artifactDir,
    SlicedArtifact.section("rules", Seq(rules.size),
      rules.iterator.flatMap { case (l, r) => Iterator(l, r) }) ++
      SlicedArtifact.section("cents",
        Seq(cents.size, cents.headOption.map(_.size).getOrElse(0)),
        SlicedArtifact.doubleParts(cents.flatten)) ++
      SlicedArtifact.section("books",
        Seq(books.size, books.headOption.map(_.size).getOrElse(0),
          books.headOption.flatMap(_.headOption).map(_.size).getOrElse(0)),
        SlicedArtifact.doubleParts(books.flatten.flatten)),
    "BPE rules / codebooks")

  /** Index all available micro-batches; returns DISTINCT batches run. */
  def indexAvailable(spark: SparkSession, docStream: DataFrame,
      checkpoint: String): Long =
    SliceIngest.runAvailable(docStream, checkpoint)(indexBatch)

  /** One micro-batch: ONE [[TextOps.bpeChunkSlices]] pass over the
    * batch's live docs feeds all four BPE frames (the chunk-once
    * convention the batch build uses), cached for the four slice
    * writes it fans into. Batches carry `(doc_id, text, embedding
    * [, is_deleted])`; a tombstoned doc contributes no frame rows —
    * its effect rides the ops record. */
  private[graft] def indexBatch(batch: DataFrame, batchId: Long): Unit = {
    val live = batch.where(!ArtifactSlices.deletedCol(batch))
    val vecs = live.select(col("doc_id").as("vec_id"), col("embedding"))
    slices.writeSlice(live.select("doc_id", "embedding"), "emb", batchId)
    val sl = TextOps.bpeChunkSlices(live.select("doc_id", "text"), rules)
      .persist()
    try {
      val (bctf, bcdl) = TextOps.bpeChunkBm25StatsFrom(sl)
      slices.writeSlice(bctf, "bctf", batchId)
      slices.writeSlice(bcdl, "bcdl", batchId)
      val bcemb = VectorOps.chunkEmbeddingsFrom(
        sl.select("doc_id", "chunk_id"), vecs)
      slices.writeSlice(bcemb, "bcemb", batchId)
      slices.writeSlice(
        VectorOps.chunkIvfPqIndex(bcemb, cents, books)
          .select(col("vec_id").as("cvec_id"), col("codes"), col("cell"))
          .withColumn("doc_id",
            expr(s"cvec_id DIV ${VectorOps.ChunkStride}")),
        "bcivf", batchId)
    } finally sl.unpersist()
    slices.writeSlice(ArtifactSlices.opsOf(batch, "doc_id"), "ops", batchId)
  }

  /** Fold the accumulated slices into one compacted generation
    * ([[SlicedArtifact.compact]]); serve results unchanged, file count
    * flat from then on. Returns the compacted high-water batch id. */
  def compact(spark: SparkSession, numFiles: Int = 1,
      graceMs: Long = SlicedArtifact.CompactionGraceMs): Long =
    slices.compact(spark, numFiles, graceMs)

  /** The resolved v6 frames `(bctf, bcdl, bcindex, bcemb)` — the
    * streamed twins of a snapshot's stored frames, in the snapshot's
    * own column shapes ([[graft.serve.Retrieval]] accessor
    * convention), or None before any batch wrote. */
  def artifact(spark: SparkSession)
      : Option[(DataFrame, DataFrame, DataFrame, DataFrame)] =
    slices.resolved(spark).map { m =>
      (m("bctf").select("doc_id", "chunk_id", "token", "tf"),
        m("bcdl").select("doc_id", "chunk_id", "dl"),
        bcivfAsIndex(m("bcivf")),
        m("bcemb").select("doc_id", "chunk_id", "embedding"))
    }

  /** Re-expose the composite id a resolved `bcivf` slice stores beside
    * its parent-doc resolution key (see the class doc). */
  private def bcivfAsIndex(bcivf: DataFrame): DataFrame =
    bcivf.select(col("cvec_id").as("vec_id"), col("codes"), col("cell"))

  /** Streamed BPE-window chunk serve — [[graft.serve.Retrieval
    * .searchBpeChunks]] over the resolved artifact: raw whitespace
    * terms encode driver-side under the STORED rules, the lexical half
    * ranks the streamed subword postings, the dense half probe-prunes
    * the streamed `bcivf` codes (optional `refine` reranking the
    * shortlist against the streamed `bcemb` floats), fused per
    * `policy`. ONE resolution serves both halves — separate resolved()
    * calls could straddle a compaction pointer swap and mix artifact
    * generations within a single query. */
  def searchBpeChunks(spark: SparkSession,
      queries: Seq[(Long, Seq[String])], k: Int,
      policy: HybridOps.Fusion = HybridOps.Rrf,
      nprobe: Int = 2, refine: Option[Int] = None): Option[DataFrame] = {
    // serve in the shared narrow serve session, exactly like the
    // snapshot handle ([[graft.serve.Retrieval.serveSessionFor]]): a
    // streamed serve's working set is the same bounded shortlist, so
    // the batch session's AQE stage-jobs and wide exchanges were pure
    // scheduling overhead here too (the measured 2× serve-latency
    // device; plan results unchanged — conf affects execution staging
    // only). ONE resolution under that session serves both halves.
    val serve = graft.serve.Retrieval.serveSessionFor(spark)
    slices.resolved(serve).map { m =>
      val bq = queries.map { case (id, ts) =>
        id -> TextOps.bpeEncodeTerms(ts, rules)
      }
      def lex = TextOps.bm25ChunkTopKFrom(
        m("bctf").select("doc_id", "chunk_id", "token", "tf"),
        m("bcdl").select("doc_id", "chunk_id", "dl"), bq, k)
      def dense = {
        val qids = queries.map(_._1)
        val emb = m("emb").select(col("doc_id").as("vec_id"),
          col("embedding"))
        val probe = VectorOps.probePlanOf(emb, qids, cents, nprobe)
        val pruned = bcivfAsIndex(m("bcivf"))
          .where(col("cell").isin(probe.cells: _*))
        refine match {
          case Some(r) => VectorOps.chunkIvfPqRefineTopK(pruned,
            m("bcemb").select("doc_id", "chunk_id", "embedding"), emb,
            qids, k, r, nprobe, cents, books, probes = Some(probe.frame))
          case None => VectorOps.chunkIvfPqTopKFromIndex(pruned, emb,
            qids, k, nprobe, cents, books, probes = Some(probe.frame))
        }
      }
      policy match {
        case HybridOps.LexicalOnly => lex
        case HybridOps.DenseOnly => dense
        case HybridOps.Rrf => HybridOps.rrfFuseChunked(lex, dense, k)
        case HybridOps.Weighted(w) =>
          HybridOps.weightedFuseChunked(lex, dense, k, w)
      }
    }
  }
}
