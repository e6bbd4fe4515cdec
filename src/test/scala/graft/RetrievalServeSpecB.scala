package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HybridOps, TextOps, VectorOps}
import graft.serve.Retrieval

/** [[RetrievalServeSpec]] part B (crash/rebuild/chunk/BPE serve tests)
  * — split for parallel forked-group execution; same coverage, no test
  * renamed or dropped. The snapshot serve surface: build/load/search must compose the
  * audited halves verbatim, so every serve is equivalence-comparable
  * to the in-memory builds — and the publish must be atomic-replace. */
class RetrievalServeSpecB extends AnyFunSuite with SparkSpec {

  private lazy val docs = graft.sources.Tables.documents(spark, sf)
    .select("doc_id", "text").cache()
  private lazy val emb = graft.sources.Tables.embeddings(spark, sf)
    .select("vec_id", "embedding").cache()

  private def rows(df: DataFrame) =
    df.orderBy("query_id", "rn").collect().map(_.toSeq).toSeq

  test("rebuild crash between the dense and lexical merges: rerun converges") {
    val root = java.nio.file.Files.createTempDirectory("graft-reconv").toString
    val live = s"$root/snap"
    val docs0 = docs.where(col("doc_id") < 420)
    val emb0 = emb.where(col("vec_id") < 420)
    val prior = Retrieval.build(docs0, emb0, live)
    // ids < 4: text AND vector re-crawled; [4,8): vector-ONLY re-embed
    // — the case that catches a fingerprint committed before the chunk
    // index it certifies (an early vh merge would leave the rerun with
    // an empty vector delta and those docs' chunk codes stale forever)
    val docs1 = docs.where(col("doc_id") < 450)
      .withColumn("text", when(col("doc_id") < 4,
        concat(col("text"), lit(" recrawl two"))).otherwise(col("text")))
    val emb1 = emb.where(col("vec_id") < 450)
      .withColumn("embedding", when(col("vec_id") < 8,
        reverse(col("embedding"))).otherwise(col("embedding")))

    // die after the dense side committed but before the lexical side —
    // the snapshot is now MIXED-GENERATION (new index/emb, old tf/dl,
    // old cindex, and crucially STALE vh/dh: fingerprints commit last)
    object Crash extends Exception
    intercept[Crash.type] {
      Retrieval.rebuild(docs1, emb1, live,
        afterDenseMerge = () => throw Crash)
    }
    // still loadable (every partition directory is a complete
    // generation), and a rerun of the SAME rebuild converges: the
    // stale fingerprints re-detect the full delta, every data merge is
    // idempotent
    val recovered = Retrieval.rebuild(docs1, emb1, live)
    val want = Retrieval.build(docs1, emb1, s"$root/full",
      codebooks = Some((prior.cents, prior.books)))
    val queries = Seq(0L -> Seq("spark", "join"), 1L -> Seq("vector", "table"))
    for (p <- Seq[HybridOps.Fusion](HybridOps.Rrf, HybridOps.LexicalOnly,
        HybridOps.DenseOnly)) {
      assert(rows(recovered.search(queries, 5, p)) ===
        rows(want.search(queries, 5, p)),
        s"post-crash rerun did not converge under $p")
      assert(rows(recovered.searchChunks(queries, 5, p)) ===
        rows(want.searchChunks(queries, 5, p)),
        s"post-crash chunk serve did not converge under $p")
    }
    // airtight, not just top-k-visible: the converged chunk index is
    // ROW-IDENTICAL to the full fixed-codebook build's (deterministic
    // encode, so set equality is exact) — a vector-only doc whose
    // chunk codes stayed stale would differ here even if no query
    // surfaces it
    def cindexRows(d: String) = spark.read
      .schema("vec_id BIGINT, codes ARRAY<BIGINT>, cell BIGINT")
      .parquet(s"$d/cindex").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSet
    assert(cindexRows(live) === cindexRows(s"$root/full"),
      "post-crash chunk index diverges from the full build")
  }

  test("a partition-swap crash window heals on load: no silent row loss") {
    val root = java.nio.file.Files.createTempDirectory("graft-aside").toString
    val live = s"$root/snap"
    Retrieval.build(docs, emb, live)
    val queries = Seq(0L -> Seq("spark", "join"), 1L -> Seq("vector", "table"))
    val want = rows(Retrieval.load(spark, live).search(queries, 5))
    assert(want.nonEmpty)

    // simulate dying between replacePartitions' two renames: the live
    // partition dir is gone, its complete content stranded under the
    // dot-prefixed aside name (which parquet readers never see)
    for ((frame, partCol) <- Seq("emb" -> "pb", "tf" -> "pb",
        "index" -> "cell")) {
      val d = new java.io.File(s"$live/$frame")
      val part = d.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith(s"$partCol="))
        .minBy(_.getName)
      val v = part.getName.stripPrefix(s"$partCol=")
      assert(part.renameTo(new java.io.File(d, s".aside-$v-123456789")))
    }
    // without recovery this serve would silently drop every row of the
    // stranded partitions; load() must rename them back first
    assert(rows(Retrieval.load(spark, live).search(queries, 5)) === want,
      "serve after a crashed partition swap lost rows")
    for ((frame, partCol) <- Seq("emb" -> "pb", "tf" -> "pb",
        "index" -> "cell")) {
      val d = new java.io.File(s"$live/$frame")
      assert(!d.listFiles().exists(_.getName.startsWith(".aside-")),
        s"$frame: stranded aside not reclaimed")
    }

    // the other window — forward rename done, aside cleanup missed: a
    // read-side load IGNORES the superseded aside (dot-prefixed, and
    // load never deletes — destructive cleanup could race an in-flight
    // rebuild); the next rebuild's single-writer sweep reclaims it.
    // Unparseable debris must be skipped, not thrown on.
    val embDir = new java.io.File(s"$live/emb")
    val somePart = embDir.listFiles()
      .filter(_.getName.startsWith("pb=")).minBy(_.getName)
    val v = somePart.getName.stripPrefix("pb=")
    val stale = new java.io.File(embDir, s".aside-$v-987654321")
    val junk = new java.io.File(embDir, ".aside-7")
    assert(stale.mkdirs() && junk.mkdirs())
    assert(rows(Retrieval.load(spark, live).search(queries, 5)) === want)
    assert(stale.exists(), "read-side load must not delete")
    Retrieval.rebuild(docs, emb, live) // no-delta refresh runs the sweep
    assert(!stale.exists(), "superseded aside not reclaimed by rebuild")
    assert(rows(Retrieval.load(spark, live).search(queries, 5)) === want)
  }

  test("publish crash in the swap window leaves a loadable snapshot") {
    val root = java.nio.file.Files.createTempDirectory("graft-swap").toString
    val live = s"$root/snap"
    val queries = Seq(0L -> Seq("spark", "join"))
    Retrieval.build(docs, emb, live)
    val before = rows(Retrieval.load(spark, live).lexicalTopK(queries, 5))
    assert(before.nonEmpty)

    // a second, fully-staged snapshot (different corpus, so a wrongly
    // committed one would serve visibly different results)
    val smaller = docs.where(col("doc_id") < 250)
    Retrieval.build(smaller, emb, s"$root/staged")
    val lexSmall = rows(TextOps.bm25TopK(smaller, queries, 5))
    assert(lexSmall !== before, "staged corpus change invisible; vacuous")

    // kill the publish exactly between live→aside and staged→live: the
    // live dir is momentarily gone, but the OLD snapshot is complete
    // under its aside name — nothing is ever half-deleted
    object Crash extends Exception
    intercept[Crash.type] {
      Retrieval.publish(new java.io.File(s"$root/staged"), live,
        betweenRenames = () => throw Crash)
    }
    assert(!new java.io.File(live, "codebook.txt").exists(),
      "crash injected after the aside rename; live must be vacant")

    // load() recovers the stranded aside and serves the OLD corpus
    assert(rows(Retrieval.load(spark, live).lexicalTopK(queries, 5))
      === before, "post-crash load must serve the pre-publish snapshot")
    assert(new java.io.File(live, "codebook.txt").exists())

    // the staged snapshot survived the crash; retrying the publish
    // completes the swap and sweeps every aside
    Retrieval.publish(new java.io.File(s"$root/staged"), live)
    assert(rows(Retrieval.load(spark, live).lexicalTopK(queries, 5))
      === lexSmall)
    assert(!new java.io.File(root).listFiles()
      .exists(_.getName.startsWith("snap.old-")), "aside not swept")
  }

  test("chunk serve: stored chunk index equals the in-memory chunk build; fusion carries attribution") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk")
      .toString + "/snap"
    val loaded = Retrieval.build(docs, emb, dir)
    val queries = Seq(0L -> Seq("spark", "join"), 1L -> Seq("vector", "table"))

    // chunk-lexical half ≡ the one-shot batch chunk build over the
    // corpus (chunks scored, best chunk per doc, docs ranked)
    val lexWant = rows(TextOps.bm25ChunkTopK(docs, queries, 5))
    assert(lexWant.nonEmpty, "chunk-lexical reference empty; vacuous")
    assert(rows(loaded.chunkLexicalTopK(queries, 5)) === lexWant)
    assert(rows(loaded.searchChunks(queries, 5, HybridOps.LexicalOnly))
      === lexWant)

    // the fused doc ranking IS the RRF fusion of the two ranked halves
    // — the dense half now the stored CHUNK index's MaxSim serve
    val denseRef = loaded.chunkDenseTopK(queries.map(_._1), 5)
    val fused = loaded.searchChunks(queries, 5)
    assert(rows(fused.select("query_id", "doc_id", "rrf", "rn")) ===
      rows(HybridOps.fuse(TextOps.bm25ChunkTopK(docs, queries, 5),
        denseRef, 5, HybridOps.Rrf)),
      "chunk fusion ranking diverges from composed RRF of the halves")

    // the Weighted policy gets the same one-pass attribution: ranking
    // equals the composed weighted fusion; chunk ids ride the join
    val fusedW = loaded.searchChunks(queries, 5, HybridOps.Weighted())
    assert(rows(fusedW.select("query_id", "doc_id", "wscore", "rn")) ===
      rows(HybridOps.weightedFuse(TextOps.bm25ChunkTopK(docs, queries, 5),
        denseRef, 5)),
      "weighted chunk fusion ranking diverges from the composed halves")
    assert(fusedW.columns.contains("chunk_id"),
      "weighted chunk serve dropped the attribution column")

    // attribution: a fused row carries the lex half's best chunk for
    // its doc, or the DENSE half's ADC best chunk when only the dense
    // half surfaced it — every served doc names a passage now that
    // both halves rank chunks
    val lexBest = lexWant.map(r => (r.head, r(1)) -> r(2)).toMap
    val denseBest = denseRef.collect().map { r =>
      (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("doc_id"))) ->
        r.getLong(r.fieldIndex("chunk_id"))
    }.toMap
    val got = fused.orderBy("query_id", "rn").collect()
    assert(got.nonEmpty)
    var denseOnly = 0
    got.foreach { r =>
      val key = (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("doc_id")))
      val ck = r.getLong(r.fieldIndex("chunk_id"))
      lexBest.get(key) match {
        case Some(c) => assert(ck === c,
          s"fused row for $key carries chunk $ck; lex best is $c")
        case None => denseOnly += 1; assert(ck === denseBest(key),
          s"dense-only doc $key must carry the dense best chunk " +
            s"${denseBest(key)}, got $ck")
      }
    }
    // a multi-chunk doc attributes a REAL window index: some doc in
    // the corpus chunks into >1 window, so chunk ids above 0 exist in
    // the index (the attribution is not degenerate)
    val multi = TextOps.chunkDocs(docs).where(col("chunk_id") > 0).count()
    assert(multi > 0L, "fixture has no multi-chunk docs; attribution vacuous")

    // REFINE serve (v5): the handle's two-stage chunk-dense rides the
    // stored full-precision cemb frame, and the fused refine serve is
    // the composed fusion of the halves
    val denseR = loaded.chunkDenseTopK(queries.map(_._1), 5,
      refine = Some(8))
    val fusedR = loaded.searchChunks(queries, 5, refine = Some(8))
    assert(rows(fusedR) ===
      rows(HybridOps.rrfFuseChunked(
        TextOps.bm25ChunkTopK(docs, queries, 5), denseR, 5)),
      "refine chunk serve diverges from the composed fusion")
    // the exact rerank must actually change SOMETHING vs plain ADC on
    // this fixture, or the refine path is vacuously equal
    assert(rows(denseR) !==
      rows(loaded.chunkDenseTopK(queries.map(_._1), 5)),
      "refine indistinguishable from plain ADC here; assertions vacuous")

    // the external-model seam, durable: a snapshot built from a
    // CALLER-SUPPLIED chunk frame (here: the engine derivation handed
    // in explicitly) serves bit-identically through every chunk path
    val dirX = java.nio.file.Files.createTempDirectory("graft-chunkx")
      .toString + "/snap"
    val ext = Retrieval.build(docs, emb, dirX,
      chunkEmb = Some(graft.operators.VectorOps.chunkEmbeddings(docs, emb)))
    assert(rows(ext.searchChunks(queries, 5, refine = Some(8))) ===
      rows(fusedR),
      "externally-supplied chunk frame diverges from the engine derivation")

    // metadata-filtered chunk serve: only allowed docs surface, and
    // the lexical-only half equals the in-memory restricted chunk rank
    // (global stats, pre-filter semantics)
    val allowed = docs.select(col("doc_id")).where(col("doc_id") % 2 === 0)
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    val filRows = loaded.searchChunksFiltered(queries, allowed, 5)
      .collect().map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("doc_id")))).toSeq
    assert(filRows.nonEmpty)
    assert(filRows.forall { case (_, id) => allowedIds.contains(id) },
      s"disallowed doc served by the filtered chunk serve: $filRows")
    val (ctfM, cdlM) = TextOps.chunkBm25Stats(docs)
    assert(rows(loaded.searchChunksFiltered(queries, allowed, 5,
      HybridOps.LexicalOnly)) ===
      rows(TextOps.bm25ChunkTopKFrom(ctfM, cdlM, queries, 5, Some(allowed))))

    // raw-text chunk entry tokenizes with the ENGINE's rule
    val rawQ = Seq(0L -> "Spark  JOIN", 1L -> "vector table")
    assert(rows(loaded.searchTextChunks(rawQ, 5)) ===
      rows(loaded.searchChunks(HybridOps.tokenizeQueries(rawQ), 5)))
  }

  test("chunk-vector provenance marker: refresh cannot mix external and derived generations") {
    val root = java.nio.file.Files.createTempDirectory("graft-cembsrc").toString
    val d = docs.where(col("doc_id") < 60)
    val e = emb.where(col("vec_id") < 60)
    val ce = VectorOps.chunkEmbeddings(d, e)

    // an EXTERNAL snapshot refuses a chunkEmb-less refresh on both
    // maintenance paths — the silent-degradation hazard the marker
    // exists to close — and accepts the matching one
    val ext = s"$root/ext"
    Retrieval.build(d, e, ext, chunkEmb = Some(ce))
    val exMsgR = intercept[IllegalArgumentException] {
      Retrieval.rebuild(d, e, ext)
    }.getMessage
    assert(exMsgR.contains("caller-supplied"), exMsgR)
    val exMsgT = intercept[IllegalArgumentException] {
      Retrieval.retrain(d, e, ext)
    }.getMessage
    assert(exMsgT.contains("caller-supplied"), exMsgT)
    Retrieval.rebuild(d, e, ext, chunkEmb = Some(ce)) // matching: fine

    // a DERIVED snapshot refuses an external incremental merge (the
    // opposite mix) — provenance switches are a full build
    val der = s"$root/der"
    Retrieval.build(d, e, der)
    val deMsg = intercept[IllegalArgumentException] {
      Retrieval.rebuild(d, e, der, chunkEmb = Some(ce))
    }.getMessage
    assert(deMsg.contains("full build"), deMsg)
    Retrieval.rebuild(d, e, der) // matching: fine
    // retrain MAY switch a derived snapshot to external (full rewrite)
    Retrieval.retrain(d, e, der, chunkEmb = Some(ce))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(der, "cembsource.txt")).trim === "external")

    // a MARKERLESS snapshot holding cemb/ (the pre-provenance v5
    // layout — the chunkEmb seam predates the marker) is INDETERMINATE,
    // not derived: a chunkEmb-less retrain would silently replace what
    // may be real-model vectors with the parity derivation, so it
    // refuses until provenance is recorded or made explicit
    val unk = s"$root/unk"
    Retrieval.build(d, e, unk, chunkEmb = Some(ce))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(unk, "cembsource.txt"))
    val unkMsg = intercept[IllegalArgumentException] {
      Retrieval.retrain(d, e, unk)
    }.getMessage
    assert(unkMsg.contains("indeterminate"), unkMsg)
    // an EXPLICIT chunkEmb makes the outcome unambiguous (external) —
    // that retrain is legal and records provenance for the next round
    Retrieval.retrain(d, e, unk, chunkEmb = Some(ce))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(unk, "cembsource.txt")).trim === "external")
    // ...after which the marker is back and a derivation retrain still
    // refuses (external snapshots never silently degrade)
    assert(intercept[IllegalArgumentException] {
      Retrieval.retrain(d, e, unk)
    }.getMessage.contains("caller-supplied"))
  }

  test("chunk-artifact stats: per-partition rows/files/bytes agree with the frames on disk") {
    val root = java.nio.file.Files.createTempDirectory("graft-cstats").toString
    val d = docs.where(col("doc_id") < 80)
    val e = emb.where(col("vec_id") < 80)
    val dir = s"$root/snap"
    val h = Retrieval.build(d, e, dir)
    def check(): Unit = {
      val st = h.chunkArtifactStats().collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getInt(3), r.getLong(4)))).toMap
      assert(st.nonEmpty)
      // every live partition dir is reported, with >=1 file and >0 bytes
      st.foreach { case ((f, p), (rows, files, bytes)) =>
        assert(files >= 1 && bytes > 0L, s"$f/$p: $files files, $bytes bytes")
        assert(rows > 0L, s"$f/$p reports zero rows")
      }
      // row totals equal the frames' true counts (cell skew is readable
      // straight off the cindex rows)
      val cindexN = spark.read.parquet(s"$dir/cindex").count()
      val cembN = spark.read.parquet(s"$dir/cemb").count()
      assert(st.collect { case (("cindex", _), (r, _, _)) => r }.sum === cindexN)
      assert(st.collect { case (("cemb", _), (r, _, _)) => r }.sum === cembN)
      // chunk codes and chunk floats describe the same corpus
      assert(cindexN === cembN)
    }
    check()
    // a delta rebuild rewrites only touched partitions; the report must
    // stay consistent with the merged frames
    val d2 = d.withColumn("text", when(col("doc_id") < 3,
      concat(col("text"), lit(" churn"))).otherwise(col("text")))
    Retrieval.rebuild(d2, e, dir)
    check()

    // per-frame availability all the way down: a partial snapshot
    // keeps the stats surface for whichever chunk frames it holds
    def rmrf(sub: String): Unit =
      new scala.reflect.io.Directory(new java.io.File(s"$dir/$sub"))
        .deleteRecursively()
    def frames(): Set[String] = h.chunkArtifactStats().collect()
      .map(_.getString(0)).toSet
    rmrf("bcindex"); rmrf("bcemb") // simulate a v5 snapshot
    assert(frames() === Set("cindex", "cemb"))
    rmrf("cemb") // v4: cindex but no cemb — stats must survive
    assert(frames() === Set("cindex"))
    // ...while measureRecall (which READS cemb) refuses naming the
    // missing frame, not a raw path error mid-plan
    val mrMsg = intercept[IllegalArgumentException] {
      h.measureRecall(Seq(0L, 1L), 5)
    }.getMessage
    assert(mrMsg.contains("cemb"), mrMsg)
    rmrf("cindex") // no chunk frame at all: the upgrade message
    val stMsg = intercept[IllegalArgumentException] {
      h.chunkArtifactStats()
    }.getMessage
    assert(stMsg.contains("build()"), stMsg)
  }

  test("BPE chunk serve (v6): snapshot equals the operator composition; rules stay fixed across rebuild") {
    import graft.operators.VectorOps
    val root = java.nio.file.Files.createTempDirectory("graft-bpesnap").toString
    val d = docs.where(col("doc_id") < 80)
    val e = emb.where(col("vec_id") < 80)
    val dir = s"$root/snap"
    val h = Retrieval.build(d, e, dir)
    val queries = Seq(0L -> Seq("spark", "join"), 1L -> Seq("vector", "table"))
    val qids = queries.map(_._1)

    // the snapshot serve ≡ an INDEPENDENT operator-level composition
    // over frames built from the same corpus under the LOADED rules +
    // books (the searchChunks equivalence contract at the BPE meter)
    val rules = h.bpeRules
    assert(rules.nonEmpty, "fixture learned no merge rules; test vacuous")
    val bq = queries.map { case (id, ts) =>
      id -> TextOps.bpeEncodeTerms(ts, rules)
    }
    val slices = TextOps.bpeChunkSlices(d, rules)
    val (bctf, bcdl) = TextOps.bpeChunkBm25StatsFrom(slices)
    val bEmb = VectorOps.chunkEmbeddingsFrom(
      slices.select("doc_id", "chunk_id"), e)
    val idx = VectorOps.chunkIvfPqIndex(bEmb, h.cents, h.books)
    val probe = VectorOps.probePlanOf(e, qids, h.cents, 2)
    def composed(refine: Option[Int]) = {
      val pruned = idx.where(col("cell").isin(probe.cells: _*))
      val dense = refine match {
        case Some(r) => VectorOps.chunkIvfPqRefineTopK(pruned, bEmb, e,
          qids, 5, r, 2, h.cents, h.books, probes = Some(probe.frame))
        case None => VectorOps.chunkIvfPqTopKFromIndex(pruned, e, qids,
          5, 2, h.cents, h.books, probes = Some(probe.frame))
      }
      HybridOps.rrfFuseChunked(
        TextOps.bm25ChunkTopKFrom(bctf, bcdl, bq, 5), dense, 5)
    }
    assert(rows(h.searchBpeChunks(queries, 5)) === rows(composed(None)))
    assert(rows(h.searchBpeChunks(queries, 5, refine = Some(8))) ===
      rows(composed(Some(8))))
    // refine actually changes something on this fixture
    assert(rows(h.searchBpeChunks(queries, 5, refine = Some(8))) !==
      rows(h.searchBpeChunks(queries, 5)),
      "BPE refine indistinguishable from ADC here; assertions vacuous")

    // filtered serve at the BPE meter: only allowed docs surface, and
    // the lexical-only policy equals the operator-level restricted rank
    val allowed = d.select(col("doc_id")).where(col("doc_id") % 2 === 0)
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    val filRows = h.searchBpeChunksFiltered(queries, allowed, 5,
        refine = Some(8))
      .collect().map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("doc_id")))).toSeq
    assert(filRows.nonEmpty &&
      filRows.forall { case (_, id) => allowedIds.contains(id) },
      s"disallowed doc served by the filtered BPE serve: $filRows")
    assert(rows(h.searchBpeChunksFiltered(queries, allowed, 5,
        HybridOps.LexicalOnly)) ===
      rows(TextOps.bm25ChunkTopKFrom(bctf, bcdl, bq, 5, Some(allowed))))

    // rebuild: the tokenizer stays FIXED (rules file byte-identical),
    // the delta re-chunks under it, and the refreshed serve equals a
    // FULL build pinned to the same books AND rules on the new corpus
    val rulesBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "bperules.txt")).toSeq
    val d2 = d.withColumn("text", when(col("doc_id") < 3,
      concat(col("text"), lit(" bpe churn"))).otherwise(col("text")))
    Retrieval.rebuild(d2, e, dir)
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "bperules.txt")).toSeq === rulesBytes,
      "rebuild must never retrain the tokenizer")
    val fullDir = s"$root/full"
    Retrieval.build(d2, e, fullDir,
      codebooks = Some((h.cents, h.books)), bpeRules = Some(rules))
    assert(rows(Retrieval.load(spark, dir)
        .searchBpeChunks(queries, 5, refine = Some(8))) ===
      rows(Retrieval.load(spark, fullDir)
        .searchBpeChunks(queries, 5, refine = Some(8))),
      "incremental BPE refresh diverges from the fixed-rules full build")
  }

  test("BPE at a production-shaped vocabulary: 64 rules train, encode and serve correctly") {
    // the tokenizer family must not silently assume the toy k=8: this
    // is the one dimension production changes by orders of magnitude.
    // The unrolled per-rule ORACLE chain deliberately stays at k=8
    // (64 unrolled rounds would be an oracle stress test, not a
    // correctness gate); correctness here rides the rules-PINNED path:
    // build(bpeRules = ...) + the driver/column encode symmetry.
    val d = docs.where(col("doc_id") < 120)
    val t0 = System.nanoTime()
    val rules = TextOps.bpeMerges(docs, 64).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val trainSecs = (System.nanoTime() - t0) / 1e9
    // the fixture vocabulary supports the full ladder (no early
    // exhaustion), ranks dense from 1, merges well-formed
    assert(rules.size === 64, s"learned ${rules.size} rules, wanted 64")
    info(f"64-rule training: $trainSecs%.1f s " +
      f"(${trainSecs / 64}%.3f s/rule; one bounded argmax round each)")

    // encode symmetry at 64 rules: driver fold ≡ column fold, symbol
    // for symbol, including chained merges the 8-rule table never
    // reaches and non-BMP code points
    val terms = Seq("spark", "join", "vector", "table", "window",
      "partition", "aggregate", "banana", "a𝄞b", "")
    val termDocs = { import spark.implicits._
      terms.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text") }
    val (tctf, _) = TextOps.bpeChunkBm25Stats(termDocs, rules)
    val engine = tctf.collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => r.getString(2) -> r.getLong(3)).toMap }
    terms.zipWithIndex.foreach { case (t, i) =>
      val driver = TextOps.bpeEncodeTerms(Seq(t), rules)
        .groupBy(identity).map { case (s, o) => s -> o.size.toLong }
      assert(driver === engine.getOrElse(i.toLong, Map.empty[String, Long]),
        s"64-rule encode mismatch on '$t'")
    }

    // vocabulary closure: every symbol the 64-rule encode emits over
    // the corpus is a single code point or one of the 64 merged
    // strings — the greedy fold can't invent out-of-vocab symbols
    val vocab = rules.map { case (l, r) => l + r }.toSet
    val emitted = TextOps.bpeChunkBm25Stats(d, rules)._1
      .select("token").distinct().collect().map(_.getString(0)).toSeq
    assert(emitted.nonEmpty)
    val oov = emitted.filterNot(s =>
      s.codePointCount(0, s.length) == 1 || vocab.contains(s))
    assert(oov.isEmpty, s"out-of-vocabulary symbols emitted: $oov")
    // ...and the deeper table is actually USED: some emitted symbol
    // comes from a rule past the toy 8 (else this test is vacuous)
    val deepVocab = rules.drop(8).map { case (l, r) => l + r }.toSet
    assert(emitted.exists(deepVocab.contains),
      "no symbol from rules 9..64 ever emitted; vocabulary too shallow")

    // serve under the pinned 64-rule table: the snapshot trains
    // nothing (rules arrive like pinned codebooks), stores the table
    // verbatim, and both BPE serve halves equal the operator-level
    // composition under the SAME rules
    val root = java.nio.file.Files.createTempDirectory("graft-bpe64").toString
    val e = emb.where(col("vec_id") < 120)
    val h = Retrieval.build(d, e, s"$root/snap", bpeRules = Some(rules))
    assert(h.bpeRules === rules, "snapshot did not store the pinned rules")
    val queries = Seq(0L -> Seq("spark", "join"), 1L -> Seq("vector", "table"))
    val bq = queries.map { case (id, ts) =>
      id -> TextOps.bpeEncodeTerms(ts, rules)
    }
    val (bctf, bcdl) = TextOps.bpeChunkBm25Stats(d, rules)
    assert(rows(h.searchBpeChunks(queries, 5, HybridOps.LexicalOnly)) ===
      rows(TextOps.bm25ChunkTopKFrom(bctf, bcdl, bq, 5)),
      "64-rule lexical BPE serve diverges from the operator composition")
    val hyb = h.searchBpeChunks(queries, 5, refine = Some(8))
    assert(rows(hyb).nonEmpty, "64-rule hybrid BPE serve returned nothing")
    // a refresh under the stored table keeps the rules FIXED (the
    // codebook convention, independent of table size)
    Retrieval.rebuild(d.withColumn("text",
        when(col("doc_id") === 0, lit("churned text")).otherwise(col("text"))),
      e, s"$root/snap")
    assert(Retrieval.load(spark, s"$root/snap").bpeRules === rules,
      "rebuild re-learned the 64-rule table")
  }

  test("measureRecall: the handle's curve over stored artifacts equals the operator-level curve") {
    val root = java.nio.file.Files.createTempDirectory("graft-mrec").toString
    val d = docs.where(col("doc_id") < 80)
    val e = emb.where(col("vec_id") < 80)
    val h = Retrieval.build(d, e, s"$root/snap")
    val qids = (0L until 10L).toSeq
    val got = h.measureRecall(qids, 3, nprobes = Seq(1, 2),
        refines = Seq(5, 10))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // operator-level curve under the SAME loaded books: the stored
    // index/cemb frames are row-identical to a fresh encode, so the
    // two paths must produce the same grid bit for bit
    val want = graft.operators.VectorOps.recallCurve(e, d, qids, 3,
        nprobes = Seq(1, 2), refines = Seq(5, 10),
        centroids = Some(h.cents), resBooks = Some(h.books))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got.nonEmpty && got === want)
    // the BPE meter: the chunk family reads the v6 frames, so the
    // curve equals the operator-level curve over an independent
    // bcemb/bcindex build under the LOADED rules + books (the doc
    // family is meter-independent)
    val gotBpe = h.measureRecall(qids, 3, nprobes = Seq(1, 2),
        refines = Seq(5, 10), bpeWindows = true)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val bEmb = graft.operators.VectorOps.chunkEmbeddingsFrom(
      TextOps.bpeChunkSlices(d, h.bpeRules).select("doc_id", "chunk_id"),
      e)
    val wantBpe = graft.operators.VectorOps.recallCurveFrom(
        e, bEmb,
        graft.operators.VectorOps.ivfPqIndex(e, h.cents, h.books,
          residual = true),
        graft.operators.VectorOps.chunkIvfPqIndex(bEmb, h.cents, h.books),
        h.cents, h.books, qids, 3, Seq(1, 2), Seq(5, 10))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(gotBpe.nonEmpty && gotBpe === wantBpe,
      "BPE-meter curve diverges from the operator-level twin")

    // sanity on the shape: at each nprobe, refine never loses to ADC
    // within a family (the rerank reorders a superset of information)
    val byKey = got.map(r => (r(0), r(1), r(2)) -> r(5)).toMap
    Seq(1, 2).foreach { np =>
      Seq("doc", "chunk").foreach { fam =>
        val adc = byKey((s"${fam}_adc", np, 0)).asInstanceOf[Double]
        val ref = byKey((s"${fam}_refine", np, 10)).asInstanceOf[Double]
        assert(ref >= adc - 1e-9,
          s"$fam refine@10 $ref below ADC $adc at nprobe=$np")
      }
    }
  }
}
