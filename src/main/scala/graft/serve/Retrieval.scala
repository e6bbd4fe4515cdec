package graft.serve

import graft.operators.{HybridOps, TextOps, VectorOps}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One-handle retrieval over a corpus snapshot — the serve surface a
  * user actually deploys, packaging every index artifact this engine
  * builds behind `build`/`load`/`search` instead of five hand-wired
  * frames.
  *
  * The reference's whole job is feeding documents INTO a search service
  * (reference: flows/main_flow.py:528-563 bulk-indexes and never reads
  * back); this is the Spark-native answer to the half the reference
  * outsources. A snapshot directory holds:
  *
  *  - `codebook.txt` / `pqbooks.txt` — the coarse IVF codebook and the
  *    residual PQ books, doubles as raw IEEE-754 bits (bit-identical
  *    round trip, the registry-artifact convention);
  *  - `index/` — the residual IVFADC frame `(vec_id, codes, cell)`
  *    written `partitionBy(cell)`, so a probed serve read
  *    PARTITION-PRUNES to ~nprobe/cells of the files;
  *  - `emb/` — the float column, read only for query-vector lookup and
  *    the bounded exact rerank (never scanned as stage 1);
  *  - `tf/` / `dl/` — the lexical index frames BM25 serves from.
  *
  * Publish is atomic: everything stages into a sibling tmp directory
  * and a rename-aside swap commits it (the [[graft.sync.IndexStore]]
  * alias-swap convention) — live → `dir.old-<nonce>`, staged → live,
  * delete the aside. A crashed build leaves a COMPLETE snapshot under
  * some name, never a half-written or half-deleted one; `load` renames
  * a stranded aside back into place if the crash hit the swap window.
  *
  * Serving composes the engine's audited halves verbatim —
  * [[TextOps.bm25TopKFrom]], [[VectorOps.ivfPqRefineTopK]] over the
  * pruned index read, [[HybridOps.fuse]] — so every scale shape and
  * determinism contract documented on those operators holds unchanged
  * here, and a snapshot serve is equivalence-testable against the
  * in-memory builds. */
final class Retrieval private[serve] (spark: SparkSession, dir: String,
    val cents: Seq[Seq[Double]], val books: Seq[Seq[Seq[Double]]]) {

  private def emb = spark.read.parquet(s"$dir/emb")
  private def tf = spark.read.parquet(s"$dir/tf")
  private def dl = spark.read.parquet(s"$dir/dl")

  /** Dense top-k from the stored index: driver probe ranking → the
    * probed-cell filter prunes the partitioned index read → residual
    * ADC on survivors → exact rerank of the `refine` shortlist against
    * the float column (bounded lookups, not a scan). */
  def denseTopK(queryIds: Seq[Long], k: Int, nprobe: Int = 2,
      refine: Int = VectorOps.BinaryShortlist): DataFrame = {
    val probed = VectorOps.probedCellsOf(emb, queryIds, cents, nprobe)
    val index = spark.read.schema(Retrieval.IndexSchema)
      .parquet(s"$dir/index")
      .where(col("cell").isin(probed: _*))
    VectorOps.ivfPqRefineTopK(index, emb, queryIds, k, refine, nprobe,
      cents, books, residual = true)
  }

  /** Lexical top-k from the stored tf/dl frames — df/N/avgdl derive at
    * serve through the same path the batch build uses. */
  def lexicalTopK(queries: Seq[(Long, Seq[String])], k: Int): DataFrame =
    TextOps.bm25TopKFrom(tf, dl, queries, k)

  /** THE entry: both halves from the stored artifacts, fused under the
    * policy (each query id doubles as its query vector's vec_id — the
    * shared-id hybrid layout). */
  def search(queries: Seq[(Long, Seq[String])], k: Int,
      policy: HybridOps.Fusion = HybridOps.Rrf,
      nprobe: Int = 2): DataFrame = {
    def dense = denseTopK(queries.map(_._1), k, nprobe)
      .withColumnRenamed("vec_id", "doc_id")
    policy match {
      case HybridOps.LexicalOnly => lexicalTopK(queries, k)
      case HybridOps.DenseOnly => dense
      case p => HybridOps.fuse(lexicalTopK(queries, k), dense, k, p)
    }
  }

  /** [[search]] over raw query strings — tokenized with the engine's
    * own rule ([[HybridOps.tokenizeQueries]]), so querying can never
    * disagree with indexing on token boundaries. */
  def searchText(queries: Seq[(Long, String)], k: Int,
      policy: HybridOps.Fusion = HybridOps.Rrf, nprobe: Int = 2): DataFrame =
    search(HybridOps.tokenizeQueries(queries), k, policy, nprobe)

  /** Metadata-filtered serve from the stored artifacts — pre-filter
    * candidates, global stats ([[HybridOps.searchFiltered]]'s
    * semantics). The dense half semi-joins the allowed id list onto the
    * probed index slice BEFORE ADC, so the filter composes with the
    * partition-pruned read instead of replacing it. */
  def searchFiltered(queries: Seq[(Long, Seq[String])], allowed: DataFrame,
      k: Int, policy: HybridOps.Fusion = HybridOps.Rrf,
      nprobe: Int = 2, refine: Int = VectorOps.BinaryShortlist): DataFrame = {
    def lex = TextOps.bm25TopKFrom(tf, dl, queries, k, Some(allowed))
    // dense pre-filter: restrict candidates BEFORE the final rank. The
    // shortlist widens to `refine` before the filter, so selective
    // predicates still fill k from the probed cells.
    def dense = {
      val qids = queries.map(_._1)
      val probed = VectorOps.probedCellsOf(emb, qids, cents, nprobe)
      val index = spark.read.schema(Retrieval.IndexSchema)
        .parquet(s"$dir/index")
        .where(col("cell").isin(probed: _*))
        .join(broadcast(allowed.toDF("vec_id")), Seq("vec_id"), "left_semi")
      VectorOps.ivfPqRefineTopK(index, emb, qids, k, refine, nprobe,
        cents, books, residual = true)
        .withColumnRenamed("vec_id", "doc_id")
    }
    policy match {
      case HybridOps.LexicalOnly => lex
      case HybridOps.DenseOnly => dense
      case p => HybridOps.fuse(lex, dense, k, p)
    }
  }
}

object Retrieval {

  /** Explicit read schema so the `cell` PARTITION column keeps its
    * written BIGINT type (inference would narrow it to INT and put the
    * pruning filter's long literals behind a cast). */
  private[graft] val IndexSchema = "vec_id BIGINT, codes ARRAY<BIGINT>, cell BIGINT"

  private def writeBooks(path: java.nio.file.Path,
      rows: Seq[Seq[Double]]): Unit = {
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path,
      rows.map(_.map(java.lang.Double.doubleToLongBits).mkString(","))
        .mkString("\n"))
    ()
  }

  private def readBooks(path: java.nio.file.Path): List[Seq[Double]] =
    java.nio.file.Files.readString(path).split("\n").toList
      .map(_.split(",").toSeq
        .map(b => java.lang.Double.longBitsToDouble(b.toLong)))

  /** Train, encode, and publish every artifact for the snapshot, then
    * return the loaded handle. Training cost is the documented
    * once-per-snapshot work ([[VectorOps.trainedCentroids]] +
    * [[VectorOps.pqResidualCodebooks]]); encoding and the lexical
    * aggregates are single corpus passes. Atomic: stage + rename. */
  def build(docs: DataFrame, embeddings: DataFrame, dir: String,
      checkpointDir: Option[String] = None): Retrieval = {
    val spark = docs.sparkSession
    val staged = new java.io.File(s"$dir.tmp-${System.nanoTime()}")
    val cents = VectorOps.trainedCentroids(embeddings)
    val books = VectorOps.pqResidualCodebooks(embeddings, cents)
    writeBooks(staged.toPath.resolve("codebook.txt"), cents)
    writeBooks(staged.toPath.resolve("pqbooks.txt"), books.flatten)
    VectorOps.ivfPqIndex(embeddings, cents, books, residual = true)
      .write.partitionBy("cell").mode(SaveMode.Overwrite)
      .parquet(s"$staged/index")
    embeddings.select("vec_id", "embedding")
      .write.mode(SaveMode.Overwrite).parquet(s"$staged/emb")
    val (tf, dl) = TextOps.bm25Stats(docs, checkpointDir)
    tf.write.mode(SaveMode.Overwrite).parquet(s"$staged/tf")
    dl.write.mode(SaveMode.Overwrite).parquet(s"$staged/dl")
    publish(staged, dir)
    load(spark, dir)
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(); ()
  }

  /** Commit a fully-staged snapshot directory as `dir` by rename-aside
    * swap: live → `dir.old-<nonce>`, staged → live, delete the aside.
    * At NO point does a partially-deleted directory exist under any
    * name — every named directory is a complete snapshot — so a crash
    * anywhere leaves either the new snapshot live, or the old one live,
    * or (crash exactly between the two renames) the old one complete
    * under its aside name, which [[load]] recovers by renaming back.
    * The earlier delete-then-rename sequence could crash mid-recursive-
    * delete and leave `codebook.txt` alive over a truncated `index/` —
    * a corrupt state `load` would accept.
    *
    * `betweenRenames` is a test seam: the crash-injection spec throws
    * from it to simulate dying in the swap window. */
  private[graft] def publish(staged: java.io.File, dir: String,
      betweenRenames: () => Unit = () => ()): Unit = {
    val target = new java.io.File(dir)
    val aside = new java.io.File(s"$dir.old-${System.nanoTime()}")
    val hadOld = target.exists() && target.renameTo(aside)
    betweenRenames()
    if (!staged.renameTo(target)) {
      // lost a concurrent publish race: the winner's snapshot is
      // already at `dir` — serve theirs, drop ours (training is
      // deterministic, so the artifacts are identical anyway)
      require(new java.io.File(target, "codebook.txt").exists(),
        s"snapshot publish failed: could not rename $staged to $dir " +
          "and no published snapshot exists there")
      rm(staged)
    }
    if (hadOld) rm(aside)
    // sweep asides orphaned by a crash after a past swap completed but
    // before its delete ran (the live snapshot supersedes them all)
    asidesOf(dir).foreach(rm)
  }

  /** `dir.old-<nonce>` siblings, oldest first. */
  private def asidesOf(dir: String): Seq[java.io.File] = {
    val f = new java.io.File(dir).getAbsoluteFile
    val prefix = f.getName + ".old-"
    Option(f.getParentFile.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(_.getName.startsWith(prefix))
      .sortBy(_.getName.stripPrefix(prefix).toLong).toSeq
  }

  /** Recovery for a crash inside [[publish]]'s swap window: if no live
    * snapshot exists but a complete aside does, rename the newest aside
    * back into place. A concurrent finished publish wins the rename
    * race harmlessly (the aside rename fails, the live dir serves). */
  private def recoverAside(dir: String): Unit =
    asidesOf(dir)
      .filter(a => new java.io.File(a, "codebook.txt").exists())
      .lastOption.foreach { a => a.renameTo(new java.io.File(dir)); () }

  /** Load a published snapshot's handle (codebooks round-trip through
    * raw bits, so a loaded handle serves bit-identically to the one
    * `build` returned). */
  def load(spark: SparkSession, dir: String): Retrieval = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root.resolve("codebook.txt")))
      recoverAside(dir)
    require(java.nio.file.Files.exists(root.resolve("codebook.txt")),
      s"$dir is not a published retrieval snapshot")
    val cents = readBooks(root.resolve("codebook.txt"))
    val books = readBooks(root.resolve("pqbooks.txt"))
      .grouped(VectorOps.PqSubCentroids).toList
      .map(_.toSeq)
    new Retrieval(spark, dir, cents, books)
  }
}
