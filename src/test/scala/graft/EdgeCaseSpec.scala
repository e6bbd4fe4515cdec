package graft

import graft.operators.{Dedup, IndexerOps, TextOps, VectorOps}
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input robustness: empty relations, single-token and
  * empty-string documents, zero vectors — every operator must return a
  * well-formed (possibly empty) result, never throw. */
class EdgeCaseSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val weirdDocs = Seq(
    (1L, "", "en", "s", 0L),
    (2L, "one", "de", "s", 3L),
    (3L, "a a a a a a a a", "fr", "s", 15L),
    (4L, "ünïcode tökens ünïcode tökens here", "es", "s", 34L),
    (5L, "x y", "zh", "s", 3L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private val emptyDocs = weirdDocs.limit(0)

  test("text operators survive empty/one-token/unicode documents") {
    assert(TextOps.qualityScore(weirdDocs).count() === 5)
    assert(TextOps.simHash(weirdDocs).count() === 5)
    assert(TextOps.fingerprint(weirdDocs).count() === 5)
    assert(TextOps.languageId(weirdDocs).count() === 5)
    assert(TextOps.tokenCounts(weirdDocs).count() === 5)
    // quality ratios stay finite (no division by zero)
    TextOps.qualityScore(weirdDocs).collect().foreach { r =>
      assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite)
    }
  }

  test("dedup operators on empty and tiny inputs") {
    assert(Dedup.exactDedup(emptyDocs).count() === 0)
    assert(Dedup.nearDupPairs(emptyDocs).count() === 0)
    assert(Dedup.nearDupDedup(emptyDocs, 0.8).count() === 0)
    // connected components over no pairs: empty, converges immediately
    assert(Dedup.duplicateClusters(Dedup.nearDupPairs(emptyDocs)).count() === 0)
    // a single pair is its own cluster
    val one = Seq((7L, 9L, 1.0)).toDF("doc_a", "doc_b", "jaccard")
    assert(Dedup.duplicateClusters(one).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap === Map(7L -> 7L, 9L -> 7L))
    // single-token docs shingle to themselves; no self-pairs
    val pairs = Dedup.nearDupPairs(weirdDocs).collect()
    pairs.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    // identical-content docs dedup to the min id
    val dup = weirdDocs.union(weirdDocs.withColumn("doc_id", col("doc_id") + 100))
    val kept = Dedup.exactDedup(dup).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("vector operators on empty input and zero vectors") {
    val empty = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(VectorOps.cosineTopK(empty, Seq(0L), 5).count() === 0)
    assert(VectorOps.annTopK(empty, Seq(0L), 5).count() === 0)
    // a zero vector yields NaN cosine — surfaced, not crashed, and a
    // NaN never outranks real similarities in the NULLS/NaN-last sort
    val withZero = Seq(
      (0L, Array.fill(64)(0.0f), 0),
      (1L, Array.tabulate(64)(i => (i + 1).toFloat / 64), 0),
      (2L, Array.tabulate(64)(i => (64 - i).toFloat / 64), 0)
    ).toDF("vec_id", "embedding", "label")
    val top = VectorOps.cosineTopK(withZero, Seq(1L), 2).collect()
    assert(top.head.getLong(1) === 2L, "real vector must outrank the zero vector")
  }

  test("sampling and packing on degenerate inputs and extreme parameters") {
    import graft.operators.Sampling
    // fraction bounds: 0 keeps nothing, 1 keeps everything
    assert(Sampling.hashSample(weirdDocs, "doc_id", 0.0).count() === 0)
    assert(Sampling.hashSample(weirdDocs, "doc_id", 1.0).count() === 5)
    assert(Sampling.hashSample(emptyDocs, "doc_id", 0.5).count() === 0)
    // quota larger than any stratum keeps everything; quota on empty is empty
    assert(Sampling.stratifiedQuota(weirdDocs, "lang", "doc_id", 100).count() === 5)
    assert(Sampling.stratifiedQuota(emptyDocs, "lang", "doc_id", 3).count() === 0)
    // budget 1: every doc starts its own pack; pack ids are dense from 0
    val tokens = weirdDocs.select(col("doc_id"), col("lang"),
      size(TextOps.tokens(col("text"))).as("n"))
    val packed = Sampling.packByBudget(tokens, "lang", "doc_id", "n", 1L)
    assert(packed.count() === 5)
    packed.collect().foreach(r => assert(r.getAs[Long]("pack_id") >= 0))
    assert(Sampling.packByBudget(tokens.limit(0), "lang", "doc_id", "n", 512L).count() === 0)
  }

  test("contamination and cross-corpus pairs on empty/degenerate corpora") {
    // a blank candidate has no shingles: its metrics are NULL ("no
    // signal"), never a spurious 0%-contaminated claim — and a NULL
    // `contaminated` drops out of any WHERE filter, so blanks are never
    // flagged. Non-blank docs against an empty benchmark overlap nothing.
    val c = Dedup.contamination(weirdDocs, emptyDocs, 0.25).collect()
    assert(c.length === 5)
    c.foreach { r =>
      if (r.getAs[Long]("doc_id") == 1L) assert(r.isNullAt(r.fieldIndex("n_overlap")))
      else assert(r.getAs[Int]("n_overlap") === 0 && !r.getAs[Boolean]("contaminated"))
    }
    // empty candidates: empty report
    assert(Dedup.contamination(emptyDocs, weirdDocs, 0.25).count() === 0)
    // self-benchmark: every non-blank doc fully overlaps itself
    val self = Dedup.contamination(weirdDocs, weirdDocs, 0.25).collect()
    self.filter(_.getAs[Long]("doc_id") != 1L)
      .foreach(r => assert(r.getAs[Int]("n_overlap") === r.getAs[Int]("n_shingles")))
    // cross-corpus with an empty side yields no pairs
    val sh = Dedup.shingleFrame(weirdDocs)
    val shEmpty = Dedup.shingleFrame(emptyDocs)
    assert(Dedup.crossCorpusPairs(
      Dedup.minHashSignaturesFrom(sh), sh,
      Dedup.minHashSignaturesFrom(shEmpty), shEmpty, 0.0).count() === 0)
  }

  test("round-4 operators on empty and degenerate inputs") {
    import graft.operators.{Analytics, Sampling, VectorOps}
    // tf-idf / repetition / pii on empty corpora: empty, never throw
    assert(TextOps.tfIdfTopTerms(emptyDocs).count() === 0)
    assert(TextOps.repetitionMetrics(emptyDocs).count() === 0)
    assert(TextOps.piiScrub(emptyDocs, col("text")).count() === 0)
    // repetition on empty text: ngrams of "" are [""] — metrics stay
    // finite (top fraction 1.0, dup fraction 0.0) and the doc is
    // FLAGGED (an empty doc is all "repetition"; curation drops it
    // anyway via the word-count floor)
    val rep = TextOps.repetitionMetrics(weirdDocs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rep(1L).getDouble(2) === 1.0 && rep(1L).getDouble(3) === 0.0)
    assert(!rep(1L).getBoolean(4))
    // quantized ANN on empty corpus / zero vectors: empty, never throws
    val empty = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(VectorOps.annTopKQuantized(empty, Seq(0L), 5).count() === 0)
    assert(VectorOps.annTopKFiltered(empty, Seq(0L), 5, col("label") === 0).count() === 0)
    val zeros = Seq((0L, Array.fill(64)(0.0f), 0), (1L, Array.fill(64)(0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    assert(VectorOps.annTopKQuantized(zeros, Seq(0L), 5).count() === 0,
      "zero vectors must be excluded (NaN cosine), not crash")
    // as-of with an empty right side: every left row emits with NULLs
    val l = Seq((1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
      .select(col("user_id"), col("event_id"), col("ts"))
    val r0 = l.limit(0)
    val asOf = Analytics.asOfJoin(
      l.select(col("event_id"), col("user_id"), col("ts")),
      r0.select(col("event_id"), col("user_id"), col("ts"))).collect()
    assert(asOf.length === 1 && asOf(0).isNullAt(2) && asOf(0).isNullAt(3))
  }

  test("as-of join: at-or-before semantics, deterministic ties, null when no prior event") {
    import spark.implicits._
    import graft.operators.Analytics
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: purchase at 10:00 with clicks before (incl. two at the SAME
    // instant — must pick the higher event_id) and one equal-ts click
    // (at-or-before includes equality); user 2: purchase BEFORE any click
    val clicks = Seq(
      (101L, 1L, ts("2024-01-01 09:00:00")),
      (102L, 1L, ts("2024-01-01 09:30:00")), // tie on ts:
      (103L, 1L, ts("2024-01-01 09:30:00")), //   103 must win over 102
      (104L, 2L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (201L, 1L, ts("2024-01-01 09:45:00")),
      (202L, 1L, ts("2024-01-01 09:30:00")), // equal ts ⇒ click 103 counts
      (203L, 2L, ts("2024-01-01 11:00:00"))) // no prior click ⇒ NULL
      .toDF("event_id", "user_id", "ts")
    val got = Analytics.asOfJoin(purchases, clicks).collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got === Map(201L -> 103L, 202L -> 103L, 203L -> -1L))
    // lag is non-negative whenever a match exists
    Analytics.asOfJoin(purchases, clicks).collect()
      .filter(!_.isNullAt(3)).foreach(r => assert(r.getLong(3) >= 0))
  }

  test("substring ops: empty, blank, and duplication-free inputs") {
    import spark.implicits._
    import graft.operators.Dedup
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.substringDups(empty).isEmpty)
    assert(Dedup.substringScrub(empty).isEmpty)
    // blank/short docs carry no full anchor window: no extents, scrub
    // passes their (normalized) text through untouched
    val blank = Seq((1L, Some("")), (2L, Some("   ")), (3L, None),
      (4L, Some("short text"))).toDF("doc_id", "text")
    assert(Dedup.substringDups(blank).isEmpty)
    val cleaned = Dedup.substringScrub(blank).collect()
      .map(r => r.getLong(0) -> r).toMap
    def ct(id: Long) = (cleaned(id).getString(1), cleaned(id).getLong(2))
    assert(ct(1L) === (("", 0L)) && ct(2L) === (("", 0L)))
    assert(ct(4L) === (("short text", 0L)))
    // null text passes through as null (both engines agree)
    assert(cleaned(3L).isNullAt(1) && cleaned(3L).isNullAt(2))
    // docs with no shared runs: identity scrub, empty coverage report
    val distinctDocs = Seq(
      (1L, (1 to 20).map(i => f"a$i%03d").mkString(" ")),
      (2L, (1 to 20).map(i => f"b$i%03d").mkString(" "))).toDF("doc_id", "text")
    assert(Dedup.substringDups(distinctDocs).isEmpty)
    assert(Dedup.substringDupStats(distinctDocs).isEmpty)
    assert(Dedup.substringScrub(distinctDocs).where(col("n_removed") =!= 0L).isEmpty)
  }

  test("bucketed as-of join: a hot key splits across time buckets, result identical") {
    import graft.operators.Analytics
    // one pathological user: 100k purchases interleaved with 100k clicks,
    // 0.5 s apart (~28 hours) — the plain as-of scans it as ONE task;
    // hourly buckets split it into ~28 independent slices
    val base = 1700000000000000L
    val ev = spark.range(200000).select(
      col("id").as("event_id"), lit(7L).as("user_id"),
      timestamp_micros(lit(base) + col("id") * 500000L).as("ts"))
    val lefts = ev.where(col("event_id") % 2 === 0)
    val rights = ev.where(col("event_id") % 2 === 1)
    val hour = 3600000000L
    // the hot key genuinely spans many buckets
    assert(ev.select(floor(unix_micros(col("ts")) / hour)).distinct().count() >= 24)
    val plain = Analytics.asOfJoin(lefts, rights)
    val bucketed = Analytics.asOfJoinBucketed(lefts, rights, bucketMicros = hour)
    assert(bucketed.count() === plain.count())
    assert(bucketed.unionByName(plain).distinct().count() === plain.count(),
      "bucketed variant diverged from the single-window as-of")
    // and the big window really partitions on (user, bucket), so no task
    // holds more than one bucket of the hot key
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(plan.contains("user_id") && plan.contains("bucket"), plan)
  }

  test("retrieval ops on degenerate inputs: empty corpus, k over corpus size, no-term queries") {
    import graft.operators.{HybridOps, TextOps, VectorOps}
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
      .toDF("doc_id", "text")
    val emptyD = docs.limit(0)
    // bm25 over an empty corpus: no rows, no divide-by-zero from avgdl
    assert(TextOps.bm25TopK(emptyD, Seq(0L -> Seq("alpha")), 5).count() === 0)
    // query terms absent from the corpus: that query returns no rows
    val miss = TextOps.bm25TopK(docs, Seq(0L -> Seq("zzz"), 1L -> Seq("beta")), 5)
      .select("query_id").distinct().collect().map(_.getLong(0)).toSet
    assert(miss === Set(1L))
    // k far beyond corpus size: every matching doc returned, rn dense
    val big = TextOps.bm25TopK(docs, Seq(0L -> Seq("beta")), 100)
    assert(big.count() === 2)
    // fusion where one half is entirely empty: the other half's ranking
    // survives with its contribution only
    val lex = Seq((0L, 1L, 1), (0L, 2L, 2)).toDF("query_id", "doc_id", "rn")
    val fused = HybridOps.rrfFuse(lex, lex.limit(0), 5)
    assert(fused.count() === 2)
    assert(fused.orderBy("rn").collect().map(_.getLong(1)).toSeq === Seq(1L, 2L))
    // PQ on an empty corpus under given books: no rows, no failure
    val books = VectorOps.pqTrainedCodebooks(
      graft.sources.Tables.embeddings(spark, sf))
    val emptyE = graft.sources.Tables.embeddings(spark, sf).limit(0)
    assert(VectorOps.pqCodes(emptyE, Some(books)).count() === 0)
    assert(VectorOps.pqTopK(emptyE, Seq(0L), 5, Some(books)).count() === 0)
  }

  test("round-9 retrieval ops on degenerate inputs: empty allowed set, missing query ids, zero vectors, empty corpus") {
    import graft.operators.{HybridOps, TextOps, VectorOps}
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
    val (tf, dl) = TextOps.bm25Stats(docs)
    val queries = Seq(0L -> Seq("spark", "join"))
    // EMPTY allowed set: filtered search returns no rows, never errors
    val emptyAllowed = docs.select("doc_id").limit(0)
    assert(HybridOps.searchFiltered(tf, dl, emb, emptyAllowed,
      queries, 5).count() === 0)
    // a query id absent from the corpus is skipped, not an error
    assert(VectorOps.binaryTopK(emb, Seq(999999999L), 5).count() === 0)
    assert(VectorOps.prefixTopK(emb, Seq(999999999L), 5).count() === 0)
    // empty corpus: both two-stage serves produce no rows
    val emptyE = emb.limit(0)
    assert(VectorOps.binaryTopK(emptyE, Seq(0L), 5).count() === 0)
    assert(VectorOps.prefixTopK(emptyE, Seq(0L), 5).count() === 0)
    // a zero vector sketches to sig 0 / NaN prefix cosine without
    // failing, and never appears in results (the NaN screen)
    val sess = spark
    import sess.implicits._
    val withZero = emb.select("vec_id", "embedding").unionByName(
      Seq((888888L, Seq.fill(VectorOps.Dim)(0.0f)))
        .toDF("vec_id", "embedding"))
    assert(VectorOps.prefixTopK(withZero, Seq(0L), 5)
      .where(col("vec_id") === 888888L).count() === 0)
    // residual index on an empty corpus under given codebooks: no rows
    val cents = VectorOps.trainedCentroids(emb)
    val books = VectorOps.pqResidualCodebooks(emb, cents)
    assert(VectorOps.ivfPqIndex(emptyE, cents, books, residual = true)
      .count() === 0)
    // tokenizeQueries: empty string -> one empty token (the engine's
    // split rule, exactly), never an exception
    assert(HybridOps.tokenizeQueries(Seq(1L -> ""))  === Seq(1L -> Seq("")))
  }

  test("CDC merge with empty batch or empty current state") {
    val env = Tables_envelope
    val emptyBatch = env.limit(0)
    val cur = env.where(!col(IsDeleted)).select(Idx, Id, Document, IsDeleted)
    assert(IndexerOps.cdcMerge(cur, emptyBatch).count() === cur.count())
    val emptyCur = cur.limit(0)
    val merged = IndexerOps.cdcMerge(emptyCur, env)
    assert(merged.count() === env.where(!col(IsDeleted)).select(Id).distinct().count())
  }

  private def Tables_envelope = graft.sources.Tables.envelope(spark, sf)

  test("chunking survives empty/one-token docs and hits window boundaries exactly") {
    val w = TextOps.ChunkWindow
    val o = TextOps.ChunkOverlap
    val step = w - o
    // empty text tokenizes to [""] (split keeps the empty token), one
    // chunk; a doc of exactly `window` tokens is ONE chunk; window+1
    // tokens is two, the second holding overlap+1 tokens
    val boundary = Seq(
      (10L, ""),
      (11L, "solo"),
      (12L, Seq.fill(w)("t").mkString(" ")),
      (13L, Seq.fill(w + 1)("t").mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextOps.chunkDocs(boundary).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    assert(got((10L, 0L)) === ((1L, "")), "empty doc: one empty-token chunk")
    assert(got((11L, 0L)) === ((1L, "solo")))
    assert(got.keys.count(_._1 == 12L) == 1, "exact-window doc must be 1 chunk")
    assert(got((12L, 0L))._1 === w.toLong)
    assert(got.keys.count(_._1 == 13L) == 2, "window+1 doc must be 2 chunks")
    assert(got((13L, 1L))._1 === (o + 1).toLong,
      s"second chunk must carry overlap+1 tokens, got ${got((13L, 1L))._1}")
    // empty input relation: empty output, schema intact
    val none = TextOps.chunkDocs(boundary.limit(0))
    assert(none.count() === 0)
    assert(none.columns.toSeq ===
      Seq("doc_id", "chunk_id", "n_tokens", "chunk"))
  }

  test("BPE chunking: window boundaries in SYMBOL units, merged ids, degenerate docs") {
    val w = TextOps.ChunkWindow
    val o = TextOps.ChunkOverlap
    // one learned rule so merged-symbol ids are exercised; single-char
    // words elsewhere keep 1 word = 1 symbol, making the boundary
    // arithmetic readable in SYMBOL units (the meter under test)
    val rules = Seq(("a", "b"))
    val docs = Seq(
      (1L, ""),                                // no symbols at all
      (2L, "ab"),                              // one MERGED symbol
      (3L, Seq.fill(w)("x").mkString(" ")),    // exactly window symbols
      (4L, Seq.fill(w + 1)("x").mkString(" ")) // window+1 → 2 windows
    ).toDF("doc_id", "text")
    val got = TextOps.bpeChunkDocs(docs, rules).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    // empty text filters to ZERO symbols (unlike chunkDocs, whose
    // tokenizer keeps the empty token for text-surface fidelity): one
    // zero-length model window, not a phantom token
    assert(got((1L, 0L)) === ((0L, "")), "empty doc: one empty id window")
    assert(got((2L, 0L)) ===
      ((1L, (TextOps.BpeMergedIdOffset + 1).toString)),
      "merged pair must encode as offset + rank")
    assert(got.keys.count(_._1 == 3L) == 1, "exact-window doc: 1 window")
    assert(got((3L, 0L))._1 === w.toLong)
    assert(got((3L, 0L))._2 ===
      Seq.fill(w)('x'.toInt.toString).mkString(","),
      "base symbols must encode as code points")
    assert(got.keys.count(_._1 == 4L) == 2, "window+1 doc: 2 windows")
    assert(got((4L, 1L))._1 === (o + 1).toLong,
      s"second window must carry overlap+1 symbols, got ${got((4L, 1L))._1}")
    // no rules at all: every symbol is a single char, ids are ASCII
    val plain = TextOps.bpeChunkDocs(docs.where(col("doc_id") === 2L), Nil)
      .collect()
    assert(plain.length === 1 &&
      plain(0).getString(3) === s"${'a'.toInt},${'b'.toInt}")
  }

  test("chunk retrieval and audio fingerprint on degenerate inputs") {
    import graft.operators.MultimodalOps
    val docs = weirdDocs.select("doc_id", "text")
    // chunk BM25 over empty/one-token/unicode docs: well-formed
    // (possibly empty) results, never a throw; every doc chunks to
    // >= 1 window so the index covers the whole weird corpus
    val (ctf, cdl) = TextOps.chunkBm25Stats(docs)
    assert(cdl.select("doc_id").distinct().count() === 5)
    val hit = TextOps.bm25ChunkTopKFrom(ctf, cdl, Seq(0L -> Seq("one")), 5)
    assert(hit.count() === 1 &&
      hit.collect()(0).getLong(hit.columns.indexOf("doc_id")) === 2L)
    // no-term query: empty, well-formed schema
    val none = TextOps.bm25ChunkTopKFrom(ctf, cdl, Seq(0L -> Seq("zzz")), 5)
    assert(none.count() === 0)
    assert(none.columns.toSeq ===
      Seq("query_id", "doc_id", "chunk_id", "score", "rn"))
    // empty corpus: zero rows, no divide-by-zero from chunk avgdl
    val (ectf, ecdl) = TextOps.chunkBm25Stats(emptyDocs.select("doc_id", "text"))
    assert(TextOps.bm25ChunkTopKFrom(ectf, ecdl,
      Seq(0L -> Seq("one")), 5).count() === 0)
    // empty allowed set: filtered chunk rank returns nothing
    val sess = spark
    import sess.implicits._
    val noneAllowed = Seq.empty[Long].toDF("doc_id")
    assert(TextOps.bm25ChunkTopKFrom(ctf, cdl, Seq(0L -> Seq("one")), 5,
      Some(noneAllowed)).count() === 0)
    // audio fingerprint: the dup view over a single asset is that
    // asset alone (n_dups 1, rep itself); empty input stays empty
    val one = MultimodalOps.audioAssets(spark, docs.where(col("doc_id") === 2L))
    val g = MultimodalOps.audioDupGroupsFrom(
      MultimodalOps.audioFingerprint(spark, one).toDF()).collect()
    assert(g.length === 1 && g(0).getLong(3) === 1L && g(0).getLong(4) === 2L)
    assert(MultimodalOps.audioFingerprint(spark,
      MultimodalOps.audioAssets(spark, emptyDocs.select("doc_id", "text")))
      .count() === 0)
  }

  test("edit-distance pairs survive degenerate docs") {
    // shingle-less docs (empty/one-token) never band, so they can never
    // reach the Levenshtein confirm; well-formed empty results
    assert(Dedup.editDupPairs(weirdDocs.select("doc_id", "text"), 0.0)
      .collect().forall(r => !r.isNullAt(2)))
    val none = Dedup.editDupPairs(emptyDocs.select("doc_id", "text"), 0.0)
    assert(none.count() === 0)
    assert(none.columns.toSeq === Seq("doc_a", "doc_b", "edit_sim"))
    // identical docs confirm at exactly 1.0 (lev 0)
    val sess = spark
    import sess.implicits._
    val twins = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("doc_id", "text")
    val tp = Dedup.editDupPairs(twins, 0.99).collect()
    assert(tp.length == 1 && tp(0).getDouble(2) == 1.0)
  }

  test("bloom screen on degenerate inputs: empty corpus, empty-string text, within-increment dups, bad geometry") {
    // empty corpus: the filter holds zero set bits, so EVERYTHING is
    // definitely-new — never a throw, never a spurious maybe_seen
    val empty = emptyDocs.select("doc_id", "text")
    val inc = weirdDocs.select("doc_id", "text")
    val r0 = Dedup.ingestScreen(empty, inc).collect()
    assert(r0.length == 5 && r0.forall(r => !r.getBoolean(1)),
      "empty-corpus screen flagged something")
    // empty-string text is a legal content key (md5 of "") — doc 1
    // must flag when the corpus holds an empty doc
    val r1 = Dedup.ingestScreen(inc, inc).collect()
    assert(r1.length == 5 && r1.forall(_.getBoolean(1)),
      "identical corpus/increment must flag every doc (incl. empty text)")
    assert(r1.forall(_.getBoolean(2)) && r1.forall(r => !r.getBoolean(3)),
      "exact twin disagrees on the identity screen")
    // within-increment duplicates: same key rows agree on the verdict
    val dup = inc.unionByName(
      inc.select((col("doc_id") + 10L).as("doc_id"), col("text")))
    val r2 = Dedup.ingestScreen(empty, dup).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(r2.size == 10 && r2.values.forall(_ == false))
    // geometry guards say what is wrong
    assertThrows[IllegalArgumentException](
      Dedup.bloomBits(inc.select(md5(col("text")).as("content_key")),
        mbits = 1000)) // not a power of two
    assertThrows[IllegalArgumentException](
      Dedup.bloomBits(inc.select(md5(col("text")).as("content_key")),
        khash = 0))
    // null text: the key is NULL and every position null-propagates
    // (concat, not concat_ws — a dropped null would hash to phantom
    // "0:".."k-1:" positions shared by EVERY null doc). The null doc
    // neither throws, nor pollutes the filter, nor ever reads as an
    // exact dup of another null doc.
    val withNull = inc.unionByName(
      Seq((99L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val r3 = Dedup.ingestScreen(withNull, withNull).collect()
    assert(r3.length == 6)
    val nullRow = r3.find(_.getLong(0) == 99L).get
    assert(nullRow.isNullAt(1) || !nullRow.getBoolean(1),
      s"null-text doc read as seen: $nullRow")
    assert(!nullRow.getBoolean(2), "null-text doc confirmed as exact dup")
    // and the filter over the null-carrying corpus still behaves for
    // the real docs
    assert(r3.filter(_.getLong(0) != 99L).forall(_.getBoolean(1)))
  }
}
