package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HybridOps, TextOps, VectorOps}
import graft.serve.Retrieval

/** The snapshot serve surface: build/load/search must compose the
  * audited halves verbatim, so every serve is equivalence-comparable
  * to the in-memory builds — and the publish must be atomic-replace. */
class RetrievalServeSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = graft.sources.Tables.documents(spark, sf)
    .select("doc_id", "text").cache()
  private lazy val emb = graft.sources.Tables.embeddings(spark, sf)
    .select("vec_id", "embedding").cache()

  private def rows(df: DataFrame) =
    df.orderBy("query_id", "rn").collect().map(_.toSeq).toSeq

  test("snapshot build + load + search equal the in-memory composed halves") {
    val dir = java.nio.file.Files.createTempDirectory("graft-serve")
      .toString + "/snap"
    val built = Retrieval.build(docs, emb, dir)
    val loaded = Retrieval.load(spark, dir)
    // codebooks round-trip through raw IEEE-754 bits — bit-identical
    assert(loaded.cents === built.cents)
    assert(loaded.books === built.books)

    val queries = Seq(0L -> Seq("spark", "join"), 1L -> Seq("vector", "table"))
    val queryIds = queries.map(_._1)

    // lexical half ≡ the one-shot batch build over the corpus
    val lexWant = rows(TextOps.bm25TopK(docs, queries, 5))
    assert(lexWant.nonEmpty, "lexical reference empty; test is vacuous")
    assert(rows(loaded.lexicalTopK(queries, 5)) === lexWant)

    // dense half ≡ refine over the in-memory residual index under the
    // same codebooks (stored index vs freshly encoded: same rows)
    val idx = VectorOps.ivfPqIndex(emb, built.cents, built.books,
      residual = true)
    val probed = VectorOps.probedCellsOf(emb, queryIds, built.cents, 2)
    val denseWant = rows(VectorOps.ivfPqRefineTopK(
      idx.where(col("cell").isin(probed: _*)), emb, queryIds, 5,
      VectorOps.RefineShortlist, 2, built.cents, built.books,
      residual = true))
    assert(denseWant.nonEmpty, "dense reference empty; test is vacuous")
    assert(rows(loaded.denseTopK(queryIds, 5)) === denseWant)

    // fused search ≡ an INDEPENDENT composition of in-memory halves
    val denseRef = VectorOps.ivfPqRefineTopK(
      idx.where(col("cell").isin(probed: _*)), emb, queryIds, 5,
      VectorOps.RefineShortlist, 2, built.cents, built.books,
      residual = true).withColumnRenamed("vec_id", "doc_id")
    for (p <- Seq[HybridOps.Fusion](HybridOps.Rrf, HybridOps.Weighted())) {
      val want = rows(HybridOps.fuse(
        TextOps.bm25TopK(docs, queries, 5), denseRef, 5, p))
      assert(want.nonEmpty)
      assert(rows(loaded.search(queries, 5, p)) === want,
        s"snapshot serve diverges from the composed in-memory halves under $p")
    }
    // single-half policies route to the matching half
    assert(rows(loaded.search(queries, 5, HybridOps.LexicalOnly)) === lexWant)
    assert(rows(loaded.search(queries, 5, HybridOps.DenseOnly)) ===
      rows(denseRef))

    // raw-text entry: searchText tokenizes with the ENGINE's rule —
    // identical to handing in the pre-tokenized terms, and identical to
    // what Spark's own tokenizer would produce for the same strings
    val rawQueries = Seq(0L -> "Spark  JOIN", 1L -> "vector table")
    val tokenized = graft.operators.HybridOps.tokenizeQueries(rawQueries)
    val sess = spark
    import sess.implicits._
    val engineTok = rawQueries.toDF("id", "text")
      .select(col("id"), TextOps.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(tokenized.forall { case (id, ts) => engineTok(id) === ts },
      "driver-side tokenization diverges from the engine tokenizer")
    assert(rows(loaded.searchText(rawQueries, 5)) ===
      rows(loaded.search(tokenized, 5)))

    // filtered serve from the snapshot: all results allowed, and the
    // lexical half equals the operator-level filtered path
    val allowed = graft.sources.Tables.documents(spark, sf)
      .where(col("lang") === "en").select("doc_id")
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    val fil = loaded.searchFiltered(queries, allowed, 5)
    val filRows = fil.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(filRows.nonEmpty)
    assert(filRows.forall { case (_, id) => allowedIds.contains(id) },
      s"disallowed doc served by the filtered snapshot: $filRows")
    assert(rows(loaded.searchFiltered(queries, allowed, 5,
      HybridOps.LexicalOnly)) ===
      rows(TextOps.bm25TopKFrom(
        spark.read.parquet(s"$dir/tf"), spark.read.parquet(s"$dir/dl"),
        queries, 5, Some(allowed))))

    // rebuild REPLACES the snapshot atomically; the new handle and a
    // fresh load both serve the new corpus
    val smaller = docs.where(col("doc_id") < 250)
    Retrieval.build(smaller, emb, dir)
    val reloaded = Retrieval.load(spark, dir)
    val lexSmall = rows(TextOps.bm25TopK(smaller, queries, 5))
    assert(lexSmall !== lexWant, "rebuild corpus change invisible; vacuous")
    assert(rows(reloaded.lexicalTopK(queries, 5)) === lexSmall)
  }

  test("screenIngest: snapshot content always flagged, fresh content passes, deletes leave the filter") {
    val root = java.nio.file.Files.createTempDirectory("graft-bloomserve")
      .toString
    val live = s"$root/snap"
    val docs0 = docs.where(col("doc_id") < 400)
    val emb0 = emb.where(col("vec_id") < 400)
    val built = Retrieval.build(docs0, emb0, live)
    // the guarantee: every indexed doc re-presented VERBATIM is
    // maybe_seen — the filter admits no false negatives, ever
    val re = built.screenIngest(docs0).collect()
    assert(re.nonEmpty && re.forall(_.getBoolean(2)),
      "snapshot content not flagged by its own ingest filter")
    // definitely-new content passes at the sized-for rate (adaptive
    // bits ≈ 10/key → analytic FP ≈ 0.1% here; 5% is the broken-mix
    // alarm threshold, not the expectation)
    val fresh = docs.where(col("doc_id") < 64)
      .select(col("doc_id"),
        concat(col("text"), lit(" never indexed "), col("doc_id")).as("text"))
    val fr = built.screenIngest(fresh).collect()
    val fp = fr.count(_.getBoolean(2)).toDouble / fr.length
    assert(fp <= 0.05, f"fresh-content FP rate $fp%.3f")
    // deletes: the filter derives from the REBUILT dh frame, so a
    // dropped doc's content screens as never-seen on the new handle —
    // the property a persisted OR-merged bloom could not have. Pick a
    // doc whose text is UNIQUE in the corpus (the fixture plants exact
    // dups; a shared text would legitimately stay flagged).
    val uniq = docs0.groupBy(md5(col("text")).as("k"))
      .agg(count(lit(1)).as("c"), min("doc_id").as("doc_id"))
      .where(col("c") === 1).orderBy("doc_id")
      .select("doc_id").limit(1).collect()(0).getLong(0)
    val rebuilt = Retrieval.rebuild(
      docs0.where(col("doc_id") =!= uniq), emb0, live)
    val gone = rebuilt.screenIngest(docs0.where(col("doc_id") === uniq))
      .collect()
    assert(gone.length == 1 && !gone(0).getBoolean(2),
      "deleted content still flagged — filter not re-derived from dh")
    // and surviving content stays flagged on the new handle
    val kept = rebuilt.screenIngest(
      docs0.where(col("doc_id") =!= uniq).limit(50)).collect()
    assert(kept.nonEmpty && kept.forall(_.getBoolean(2)),
      "surviving content lost from the rebuilt filter")
  }

  test("screenIngest: filter persisted per publish — handle load reads no dh; fallback and rebuild upgrade agree") {
    val root = java.nio.file.Files.createTempDirectory("graft-bloomdh")
      .toString
    val live = s"$root/snap"
    val docs0 = docs.where(col("doc_id") < 300)
    val emb0 = emb.where(col("vec_id") < 300)
    val built = Retrieval.build(docs0, emb0, live)
    assert(new java.io.File(s"$live/bloomdh/_bloomgeom").isFile,
      "build did not persist the ingest filter")
    val probe = docs0.limit(30)
    def verdicts(h: Retrieval) = h.screenIngest(probe).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val persisted = verdicts(built)
    // the persisted path reads NO dh: with the fingerprint frame moved
    // aside the handle still screens — handle load is O(frame), the
    // per-session corpus-∝ derivation is gone
    val dhDir = new java.io.File(s"$live/dh")
    val dhAside = new java.io.File(root, "dh_aside")
    assert(dhDir.renameTo(dhAside))
    try assert(verdicts(Retrieval.load(spark, live)) === persisted,
      "persisted-filter verdicts diverge (or dh was read)")
    finally assert(dhAside.renameTo(dhDir))
    // pre-persistence snapshots: with bloomdh gone the handle falls
    // back to deriving from dh — verdict-identical (shared geometry)
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete(); ()
    }
    rmr(new java.io.File(s"$live/bloomdh"))
    assert(verdicts(Retrieval.load(spark, live)) === persisted,
      "derive-from-dh fallback diverges from the persisted filter")
    // and a rebuild upgrades the old snapshot in place — with no live
    // frame, the empty-delta rebuild regenerates (the heal path), so
    // the persisted frame is back even though this delta is empty
    Retrieval.rebuild(docs0, emb0, live)
    assert(new java.io.File(s"$live/bloomdh/_bloomgeom").isFile,
      "rebuild did not regenerate the persisted ingest filter")
    assert(verdicts(Retrieval.load(spark, live)) === persisted)
    // STEADY STATE: an empty-delta rebuild with a live, agreeing frame
    // keeps it byte-stable — no retire, no corpus-scale regeneration
    // (the idempotent-rerun cost contract; the frame still agrees with
    // the byte-identical dh). A mid-rebuild reader therefore always
    // sees either this valid frame or (on a dh-changing rebuild, below)
    // no frame at all — never a stale one.
    def frameFiles() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
            .toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$live/bloomdh"))
        .map(f => (f.getPath, f.length(), f.lastModified())).sortBy(_._1)
    }
    val before = frameFiles()
    var liveDuring = false
    Retrieval.rebuild(docs0, emb0, live, afterDenseMerge = () =>
      liveDuring = new java.io.File(s"$live/bloomdh").exists())
    assert(liveDuring,
      "empty-delta rebuild retired a filter that still agrees with dh")
    assert(frameFiles() === before,
      "empty-delta rebuild rewrote the bit filter frame")
    assert(verdicts(Retrieval.load(spark, live)) === persisted)
    // a crash mid-rebuild on an EMPTY delta leaves the still-valid
    // frame serving (dh never changed, so it never stopped agreeing)
    intercept[RuntimeException] {
      Retrieval.rebuild(docs0, emb0, live,
        afterDenseMerge = () => throw new RuntimeException("boom"))
    }
    assert(frameFiles() === before,
      "crashed empty-delta rebuild disturbed a valid filter")
    assert(verdicts(Retrieval.load(spark, live)) === persisted)
    // a dh-CHANGING rebuild retires the frame BEFORE any merge
    // (whenever bloomdh exists it agrees with dh — a mid-merge reader
    // takes the fallback, never a stale frame): probe from the
    // crash-injection seam, then crash there — the fallback serves and
    // the rerun converges and republishes
    val docs1 = docs0.where(col("doc_id") =!= 7L)
    val emb1 = emb0.where(col("vec_id") =!= 7L)
    var retiredDuring = false
    intercept[RuntimeException] {
      Retrieval.rebuild(docs1, emb1, live, afterDenseMerge = () => {
        retiredDuring = !new java.io.File(s"$live/bloomdh").exists()
        throw new RuntimeException("boom")
      })
    }
    assert(retiredDuring,
      "bloomdh live mid-rebuild — a stale-filter window exists")
    assert(!new java.io.File(s"$live/bloomdh").exists(),
      "crashed dh-changing rebuild left a filter it can no longer vouch for")
    val converged = Retrieval.rebuild(docs1, emb1, live)
    assert(new java.io.File(s"$live/bloomdh/_bloomgeom").isFile,
      "dh-changing rebuild did not regenerate the persisted filter")
    // and the regenerated filter serves the REBUILT corpus's verdicts
    val reProbe = verdicts(converged)
    assert(reProbe === verdicts(Retrieval.load(spark, live)))
  }

  test("screenIngest: counting-backed snapshot — persisted-filter contract holds, rebuild maintains deletes O(delta)") {
    val root = java.nio.file.Files.createTempDirectory("graft-cntdh")
      .toString
    val live = s"$root/snap"
    val docs0 = docs.where(col("doc_id") < 300)
    val emb0 = emb.where(col("vec_id") < 300)
    val built = Retrieval.build(docs0, emb0, live,
      countingIngestFilter = true)
    def sidecar() = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(live, "bloomdh", "_bloomgeom")), "UTF-8").trim
    assert(sidecar().startsWith("counting "),
      "counting build did not persist a counting-flavored filter")
    assert(Retrieval.ingestFilterFlavorOf(live) == "counting")
    val probe = docs0.limit(30)
    def verdicts(h: Retrieval) = h.screenIngest(probe).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val persisted = verdicts(built)
    assert(persisted.nonEmpty && persisted.values.forall(identity),
      "indexed content must flag on its own counting filter")
    // the persisted-filter contract, re-run at counting flavor: the
    // loaded handle reads NO dh
    val dhDir = new java.io.File(s"$live/dh")
    val dhAside = new java.io.File(root, "dh_aside")
    assert(dhDir.renameTo(dhAside))
    try assert(verdicts(Retrieval.load(spark, live)) === persisted,
      "counting persisted-filter verdicts diverge (or dh was read)")
    finally assert(dhAside.renameTo(dhDir))
    // the derive-from-dh fallback rebuilds the COUNTING flavor (the
    // marker survives the frame's loss) — verdict-identical
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete(); ()
    }
    rmr(new java.io.File(s"$live/bloomdh"))
    assert(verdicts(Retrieval.load(spark, live)) === persisted,
      "counting derive fallback diverges from the persisted filter")
    // empty-delta rebuild with the frame missing: staging declines and
    // the counting REGENERATION heals the persisted frame in place
    Retrieval.rebuild(docs0, emb0, live)
    assert(sidecar().startsWith("counting "),
      "rebuild regenerated the wrong flavor")
    assert(verdicts(Retrieval.load(spark, live)) === persisted)
    // delete rebuild: a unique-text doc drops and the filter follows
    // by O(delta) decrements — its content screens never-seen, the
    // verdict the one-way bit filter can only reach by regeneration
    val uniq = docs0.groupBy(md5(col("text")).as("k"))
      .agg(count(lit(1)).as("c"), min("doc_id").as("doc_id"))
      .where(col("c") === 1).orderBy("doc_id")
      .select("doc_id").limit(1).collect()(0).getLong(0)
    val rebuilt = Retrieval.rebuild(
      docs0.where(col("doc_id") =!= uniq), emb0, live)
    val gone = rebuilt.screenIngest(docs0.where(col("doc_id") === uniq))
      .collect()
    assert(gone.length == 1 && !gone(0).getBoolean(2),
      "deleted content still flagged — decrements did not land")
    val kept = rebuilt.screenIngest(
      docs0.where(col("doc_id") =!= uniq).limit(50)).collect()
    assert(kept.nonEmpty && kept.forall(_.getBoolean(2)),
      "surviving content lost a position — over-decremented")
    // the maintained frame IS the from-scratch counting filter of the
    // surviving corpus, row for row (the snapshot-level algebra pin)
    val parts = sidecar().split(" ")
    val (s9, m9) = (parts(1).toInt, parts(2).toInt)
    def tuples(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stored = spark.read.parquet(s"$live/bloomdh")
      .select(col("shard").cast("long").as("shard"), col("pos"),
        col("cnt"))
    val fresh = graft.operators.Dedup.shardedCountingBloomBits(
      spark.read.schema(graft.serve.Retrieval.DhSchema)
        .parquet(s"$live/dh").select(col("dh").as("content_key")),
      s9, m9)
    assert(tuples(stored) === tuples(fresh),
      "O(delta)-maintained frame diverges from the from-scratch filter")
    // retrain INHERITS the counting flavor (no silent flip back to bit)
    Retrieval.retrain(docs0.where(col("doc_id") =!= uniq), emb0, live)
    assert(Retrieval.ingestFilterFlavorOf(live) == "counting",
      "retrain silently flipped the ingest-filter flavor")
  }

  test("counting ingest update: stages from the live frame + delta keys alone — the corpus is never re-read") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cntupd")
      .toString
    val live = s"$root/snap"
    val docs0 = docs.where(col("doc_id") < 200)
    val emb0 = emb.where(col("vec_id") < 200)
    Retrieval.build(docs0, emb0, live, countingIngestFilter = true)
    val dh0 = spark.read.schema(graft.serve.Retrieval.DhSchema)
      .parquet(s"$live/dh").select("doc_id", "dh")
    val delIds = dh0.orderBy("doc_id").limit(3)
      .collect().map(_.getLong(0)).toSeq
    // frozen BEFORE dh goes aside (multiset: exactly these occurrences)
    val removed = dh0.where(col("doc_id").isin(delIds: _*))
      .select(col("dh").as("content_key")).localCheckpoint(true)
    val added = Seq("fresh doc a", "fresh doc b").toDF("text")
      .select(md5(col("text")).as("content_key")).localCheckpoint(true)
    val n = dh0.count() - 3 + 2
    // the job-count contract, made structural: with the ENTIRE dh
    // frame unreadable, the staging must still succeed — its only
    // inputs are the live counting frame and the delta key frames, so
    // a small delete delta cannot re-aggregate the corpus (there is
    // nothing to aggregate FROM); a bounded job count rules out
    // corpus-proportional work creeping in via the frame side
    val dhDir = new java.io.File(s"$live/dh")
    val aside = new java.io.File(root, "dh_aside")
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    assert(dhDir.renameTo(aside))
    spark.sparkContext.addSparkListener(l)
    val staged =
      try graft.serve.Retrieval.stageCountingIngestUpdate(spark, live,
        removed, added, n)
      finally {
        spark.sparkContext.removeSparkListener(l)
        assert(aside.renameTo(dhDir))
      }
    val upd = staged.getOrElse(
      fail("geometry-stable O(delta) update declined"))
    val stage = upd.stage
    assert(jobs <= 12,
      s"delta update ran $jobs jobs — corpus-proportional work crept in")
    // a build-written (partitioned-layout) frame with a small delta
    // must take the SPLICE path: the stage carries only the delta's
    // (shard, cb) rectangle, not the frame
    val (ts, tc) = upd.touched.getOrElse(
      fail("small delta on the partitioned layout must stage a splice"))
    // the staged region equals the from-scratch filter of the post-
    // delta key multiset RESTRICTED to that region, at the pinned
    // geometry (the install splices it over the untouched rest)
    val sc = new String(java.nio.file.Files.readAllBytes(
      stage.toPath.resolve("_bloomgeom")), "UTF-8").trim.split(" ")
    assert(sc(0) == "counting")
    def tuples(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val survivors = dh0.where(!col("doc_id").isin(delIds: _*))
      .select(col("dh").as("content_key"))
      .unionByName(added)
    val freshRegion = graft.operators.Dedup.shardedCountingBloomBits(
        survivors, sc(1).toInt, sc(2).toInt)
      .where(col("shard").isin(ts: _*) &&
        pmod(col("pos"), lit(64L)).isin(tc: _*))
    assert(tuples(spark.read.parquet(stage.toString)
        .select(col("shard").cast("long").as("shard"), col("pos"),
          col("cnt"))) === tuples(freshRegion),
      "staged O(delta) region diverges from the from-scratch filter")
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete(); ()
    }
    rmr(stage)
    // geometry drift declines: a new key count far past the pinned
    // power-of-two returns None, telling the caller to regenerate at
    // fresh geometry instead of over-filling the pinned one
    assert(graft.serve.Retrieval.stageCountingIngestUpdate(spark, live,
      removed, added, n * 1000).isEmpty,
      "an outgrown geometry must decline the O(delta) update")
  }

  test("counting delta rebuild: untouched (shard,cb) partitions stay byte-stable; empty delta rewrites nothing") {
    val root = java.nio.file.Files.createTempDirectory("graft-cntio")
      .toString
    val live = s"$root/snap"
    val docs0 = docs.where(col("doc_id") < 300)
    val emb0 = emb.where(col("vec_id") < 300)
    Retrieval.build(docs0, emb0, live, countingIngestFilter = true)
    // relative path → (length, mtime) of every data file in the frame
    def fileMap(): Map[String, (Long, Long)] = {
      val base = java.nio.file.Paths.get(live, "bloomdh")
      val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
      def walk(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(walk))
        else if (f.getName.startsWith("part-"))
          out(base.relativize(f.toPath).toString) =
            (f.length(), f.lastModified())
      }
      walk(base.toFile)
      out.toMap
    }
    val before = fileMap()
    assert(before.nonEmpty && before.keySet.forall(_.startsWith("shard=")),
      "counting build must write the partitioned (shard, cb) layout")
    // ---- empty delta: the idempotent steady-state rerun must rewrite
    // NO partition at all (install is pure renames)
    Retrieval.rebuild(docs0, emb0, live)
    assert(fileMap() === before,
      "an empty delta rewrote counting-frame partitions")
    // ---- single-doc delete: only the delta's (shard, cb) rectangle
    // may change; every other partition's files are byte-stable
    val uniq = docs0.groupBy(md5(col("text")).as("k"))
      .agg(count(lit(1)).as("c"), min("doc_id").as("doc_id"))
      .where(col("c") === 1).orderBy("doc_id")
      .select("doc_id").limit(1).collect()(0).getLong(0)
    val sc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(live, "bloomdh", "_bloomgeom")), "UTF-8")
      .trim.split(" ")
    val (s9, m9) = (sc(1).toInt, sc(2).toInt)
    // the expected rectangle, derived from the deleted doc's key alone
    val delKey = docs0.where(col("doc_id") === uniq)
      .select(md5(graft.operators.TextOps.normText(col("text")))
        .as("content_key"))
    val pairs = graft.operators.Dedup
      .shardedCountingBloomBits(delKey, s9, m9)
      .select(col("shard"), pmod(col("pos"), lit(64L)).as("cb"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rectDirs = (for (s <- pairs.map(_._1); c <- pairs.map(_._2))
      yield s"shard=$s/cb=$c").toSet
    Retrieval.rebuild(docs0.where(col("doc_id") =!= uniq), emb0, live)
    val after = fileMap()
    val (touchedB, stableB) = before.partition { case (p, _) =>
      rectDirs.exists(d => p.startsWith(d + "/")) }
    assert(touchedB.nonEmpty, "the delete's rectangle must be nonempty")
    assert(stableB.forall { case (p, v) => after.get(p).contains(v) },
      "a partition outside the delta's rectangle was rewritten")
    assert(touchedB.forall { case (p, v) => !after.get(p).contains(v) },
      "the delta's own partitions were not replaced")
    // and the spliced frame still IS the from-scratch filter of the
    // survivors — splice correctness, not just stability
    def tuples(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tuples(spark.read.parquet(s"$live/bloomdh")
        .select(col("shard").cast("long").as("shard"), col("pos"),
          col("cnt"))) ===
      tuples(graft.operators.Dedup.shardedCountingBloomBits(
        spark.read.schema(graft.serve.Retrieval.DhSchema)
          .parquet(s"$live/dh").select(col("dh").as("content_key")),
        s9, m9)),
      "spliced frame diverges from the from-scratch filter")
  }

  test("publish-from-chain: an exact-key crawl's folded counting state adopts ≡ build-from-corpus; drift refuses") {
    import graft.operators.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft-adopt")
      .toString
    // ≤ 90 docs keeps adaptiveBloomGeometry stably at (1, 1024) for
    // any live-count outcome of the crawl, so the chain's fixed
    // geometry IS the corpus's adaptive point
    val docs0 = docs.where(col("doc_id") < 90)
    val mb = 1024
    val chain = new graft.streaming.StreamingCountingBloom(
      s"$root/art", s"$root/chain-out", mbits = mb, exactKeys = true)
    def ins(df: DataFrame) = df.withColumn("op", lit("insert"))
    def del(df: DataFrame) = df.withColumn("op", lit("delete"))
    chain.screenBatch(ins(docs0.where(col("doc_id") % 3 =!= 2)), 0)
    // batch 1: the rest arrives; two batch-0 unique-text docs retire
    val b0 = docs0.where(col("doc_id") % 3 =!= 2)
    val uniq = b0.groupBy(md5(col("text")).as("k"))
      .agg(count(lit(1)).as("c"), min("doc_id").as("doc_id"))
      .where(col("c") === 1).orderBy("doc_id")
      .select("doc_id").limit(2).collect().map(_.getLong(0)).toSeq
    chain.screenBatch(
      ins(docs0.where(col("doc_id") % 3 === 2))
        .unionByName(del(b0.where(col("doc_id").isin(uniq: _*)))), 1)
    // the published corpus IS the crawl's live set: accepted inserts
    // whose key was not later deleted
    val v = chain.verdicts(spark).get
    val liveIds = v.where(col("op") === "insert" && col("applied"))
      .join(v.where(col("op") === "delete" && col("applied"))
        .select("content_key"), Seq("content_key"), "left_anti")
      .select("doc_id")
    val corpusDocs = docs0.join(liveIds, Seq("doc_id")).localCheckpoint(true)
    val embC = emb.join(liveIds.select(col("doc_id").as("vec_id")),
      Seq("vec_id")).localCheckpoint(true)
    assert(Dedup.adaptiveBloomGeometry(corpusDocs.count()) === ((1, mb)))
    val state = chain.countingState(spark).get.localCheckpoint(true)
    // codebooks pinned from a full-fixture base: the crawl's live set
    // may drop low vec_ids the PQ seed wants, and training is not what
    // this spec exercises
    val base = Retrieval.build(docs0,
      emb.where(col("vec_id") < 90), s"$root/base")
    val books = Some((base.cents, base.books))
    val adoptedH = Retrieval.build(corpusDocs, embC, s"$root/adopted",
      codebooks = books, countingIngestFilter = true,
      adoptCountingState =
        Some(Retrieval.AdoptedCountingState(state, mb)))
    val builtH = Retrieval.build(corpusDocs, embC, s"$root/built",
      codebooks = books, countingIngestFilter = true)
    // the adopted filter IS the from-corpus filter, row for row — the
    // crawl's state becomes the published index's filter with no
    // corpus re-aggregation
    def tuples(dir: String) = spark.read.parquet(s"$dir/bloomdh")
      .select(col("shard").cast("long").as("shard"), col("pos"),
        col("cnt")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tuples(s"$root/adopted") === tuples(s"$root/built"),
      "adopted chain state diverges from the from-corpus filter")
    // and serves verdict-identically (re-presented + salted probe)
    val probe = docs0.select("doc_id", "text").unionByName(
      docs0.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" fresh "),
          col("doc_id").cast("string")).as("text")))
    def verd(h: Retrieval) = h.screenIngest(probe).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(verd(adoptedH) === verd(builtH))
    // wrong chain geometry refuses (the dh fallback would answer
    // differently); a corpus that drifted from the chain's live set
    // refuses on the Σcnt = khash·live identity
    assertThrows[IllegalArgumentException](
      Retrieval.build(corpusDocs, embC, s"$root/badgeom",
        codebooks = books, countingIngestFilter = true,
        adoptCountingState =
          Some(Retrieval.AdoptedCountingState(state, mb * 2))))
    val firstLive = liveIds.orderBy("doc_id").limit(1)
      .collect()(0).getLong(0)
    assertThrows[IllegalArgumentException](
      Retrieval.build(corpusDocs.where(col("doc_id") =!= firstLive),
        embC, s"$root/drift", codebooks = books,
        countingIngestFilter = true,
        adoptCountingState =
          Some(Retrieval.AdoptedCountingState(state, mb))))
    // a SHARDED chain's state refuses: relabeling its (shard, pos)
    // rows as shard=0 would union all shards' position spaces —
    // duplicate rows the Σcnt audit cannot see (the sum is
    // shard-invariant)
    val shardedState = state.select(
      (col("pos") % 4).as("shard"), col("pos"), col("cnt"))
    val eSh = intercept[IllegalArgumentException](
      Retrieval.build(corpusDocs, embC, s"$root/shdrift",
        codebooks = books, countingIngestFilter = true,
        adoptCountingState =
          Some(Retrieval.AdoptedCountingState(shardedState, mb))))
    assert(eSh.getMessage.contains("shard column"))
  }

  test("incremental rebuild: same serve as a fixed-codebook full build, delta-only writes") {
    val root = java.nio.file.Files.createTempDirectory("graft-rebuild").toString
    val live = s"$root/snap"
    // initial corpus: ids < 420
    val docs0 = docs.where(col("doc_id") < 420)
    val emb0 = emb.where(col("vec_id") < 420)
    val prior = Retrieval.build(docs0, emb0, live)

    // the refreshed corpus — a SMALL delta (so some of the 16 cells are
    // provably untouched): ids < 4 re-crawled (new text) AND
    // re-embedded, [4,8) text-ONLY edits, [8,12) vector-ONLY
    // re-embeds (the two one-sided deltas pin that the chunk index
    // merges on the UNION of the fingerprint diffs — a text edit moves
    // chunk vectors without touching vh, a re-embed moves them without
    // touching dh), [416,420) dropped, [420,424) added
    def refresh(d: org.apache.spark.sql.DataFrame, id: String) =
      d.where(col(id) < 424 && !(col(id) >= 416 && col(id) < 420))
    val docs1 = refresh(docs, "doc_id")
      .withColumn("text", when(col("doc_id") < 4,
        concat(col("text"), lit(" refreshed crawl")))
        .when(col("doc_id") >= 4 && col("doc_id") < 8,
          concat(col("text"), lit(" text only edit")))
        .otherwise(col("text")))
    val emb1 = refresh(emb, "vec_id")
      .withColumn("embedding", when(col("vec_id") < 4 ||
          (col("vec_id") >= 8 && col("vec_id") < 12),
        reverse(col("embedding"))).otherwise(col("embedding")))

    def cellDirsOf(frame: String) = new java.io.File(s"$live/$frame")
      .listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).toSeq
    def cellDirs = cellDirsOf("index")
    val mtimeBefore = cellDirs.map(d => d.getName -> d.lastModified()).toMap
    val cMtimeBefore = cellDirsOf("cindex")
      .map(d => d.getName -> d.lastModified()).toMap
    def pbDirs(frame: String) = new java.io.File(s"$live/$frame").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("pb=")).toSeq
    val pbBefore = Seq("emb", "vh", "tf", "dl", "dh", "ctf", "cdl", "cemb")
      .map(f => f -> pbDirs(f).map(d => d.getName -> d.lastModified()).toMap)
      .toMap

    val rebuilt = Retrieval.rebuild(docs1, emb1, live)
    // codebooks untouched: rebuild NEVER retrains
    assert(rebuilt.cents === prior.cents && rebuilt.books === prior.books,
      "rebuild retrained the codebooks")

    // serve ≡ a from-scratch build pinned to the SAME codebooks
    val want = Retrieval.build(docs1, emb1, s"$root/full",
      codebooks = Some((prior.cents, prior.books)))
    val queries = Seq(0L -> Seq("spark", "join"), 1L -> Seq("vector", "table"))
    for (p <- Seq[HybridOps.Fusion](HybridOps.Rrf, HybridOps.LexicalOnly,
        HybridOps.DenseOnly)) {
      assert(rows(rebuilt.search(queries, 5, p)) ===
        rows(want.search(queries, 5, p)),
        s"incremental rebuild diverges from the full fixed-codebook build under $p")
      // the chunk-level serve rides the same merged frames
      assert(rows(rebuilt.searchChunks(queries, 5, p)) ===
        rows(want.searchChunks(queries, 5, p)),
        s"rebuilt chunk serve diverges from the full build under $p")
    }
    // refine serve over the REBUILT snapshot: the merged cemb frame
    // (text-only AND vector-only deltas both move chunk vectors)
    // reranks identically to the full build's
    assert(rows(rebuilt.searchChunks(queries, 5, HybridOps.Rrf, 2,
        Some(8))) ===
      rows(want.searchChunks(queries, 5, HybridOps.Rrf, 2, Some(8))),
      "rebuilt refine chunk serve diverges from the full build")

    // delta-only writes: cells holding only untouched vectors must not
    // have been rewritten. Touched = old cells of changed/deleted ids
    // plus new cells of changed/added ids, both under the PRIOR books.
    def cellsOf(e: org.apache.spark.sql.DataFrame) = graft.operators.VectorOps
      .ivfPqIndex(e, prior.cents, prior.books, residual = true)
      .select("cell").distinct().collect().map("cell=" + _.getLong(0)).toSet
    def vecTouched(id: org.apache.spark.sql.Column) =
      id < 4 || (id >= 8 && id < 12)
    val touchedCells =
      cellsOf(emb0.where(vecTouched(col("vec_id")) || col("vec_id") >= 416)) ++
      cellsOf(emb1.where(vecTouched(col("vec_id")) || col("vec_id") >= 420))
    val untouched = mtimeBefore.keySet -- touchedCells
    assert(untouched.nonEmpty,
      "every cell touched; the delta-only assertion is vacuous")
    for (d <- cellDirs if untouched.contains(d.getName))
      assert(d.lastModified() == mtimeBefore(d.getName),
        s"${d.getName} was rewritten by a delta that never touched it")

    // chunk-index cells: touched docs are the UNION of the text and
    // vector deltas (ids < 12, [416,424)); chunk cells outside their
    // old+new assignments must not move
    def cCellsOf(d: org.apache.spark.sql.DataFrame,
        e: org.apache.spark.sql.DataFrame) = graft.operators.VectorOps
      .chunkIvfPqIndex(graft.operators.VectorOps.chunkEmbeddings(d, e),
        prior.cents, prior.books)
      .select("cell").distinct().collect().map("cell=" + _.getLong(0)).toSet
    val touchedCCells =
      cCellsOf(docs0.where(col("doc_id") < 12 || col("doc_id") >= 416),
        emb0.where(col("vec_id") < 12 || col("vec_id") >= 416)) ++
      cCellsOf(docs1.where(col("doc_id") < 12 || col("doc_id") >= 420),
        emb1.where(col("vec_id") < 12 || col("vec_id") >= 420))
    val cUntouched = cMtimeBefore.keySet -- touchedCCells
    assert(cUntouched.nonEmpty,
      "every chunk cell touched; the cindex delta assertion is vacuous")
    for (d <- cellDirsOf("cindex") if cUntouched.contains(d.getName))
      assert(d.lastModified() == cMtimeBefore(d.getName),
        s"cindex/${d.getName} was rewritten by a delta that never touched it")

    // same for the id-bucketed frames: buckets holding no touched id
    // (touched = ids < 12, [416,424) → pb = id mod 32) must not move
    val touchedPb = (0L until 12L).map(_ % 32) ++ (416L until 424L).map(_ % 32)
    for (f <- Seq("emb", "vh", "tf", "dl", "dh", "ctf", "cdl", "cemb");
        d <- pbDirs(f)
        if !touchedPb.map(p => s"pb=$p").contains(d.getName)) {
      assert(pbBefore(f).contains(d.getName), s"$f/${d.getName} appeared")
      assert(d.lastModified() == pbBefore(f)(d.getName),
        s"$f/${d.getName} was rewritten by a delta that never touched it")
    }

    // idempotence: re-running the same rebuild is a no-op serve-wise
    val again = Retrieval.rebuild(docs1, emb1, live)
    assert(rows(again.search(queries, 5)) === rows(want.search(queries, 5)))
  }

  test("codebook retrain migrates a live snapshot: fresh books, recall recovers, next rebuild incremental") {
    val root = java.nio.file.Files.createTempDirectory("graft-retrain").toString
    val live = s"$root/snap"
    val docs0 = docs.where(col("doc_id") < 420)
    val emb0 = emb.where(col("vec_id") < 420)
    val prior = Retrieval.build(docs0, emb0, live)

    // drift the distribution out from under the books: EVERY vector
    // reversed (a layout the old coarse cells and residual books never
    // saw), plus additions — the months-of-drift scenario compressed
    val docs1 = docs.where(col("doc_id") < 450)
    val emb1 = emb.where(col("vec_id") < 450)
      .withColumn("embedding", reverse(col("embedding")))

    // the steady-state path holds books fixed — consistent, but now
    // mis-trained relative to the corpus it indexes
    val stale = Retrieval.rebuild(docs1, emb1, live)
    assert(stale.cents === prior.cents && stale.books === prior.books)

    val qids = Seq(0L, 1L, 2L)
    def recallOf(h: Retrieval): Long = {
      val exact = VectorOps.cosineTopK(emb1, qids, 5)
        .select("query_id", "vec_id")
      h.denseTopK(qids, 5).select("query_id", "vec_id")
        .join(exact, Seq("query_id", "vec_id"), "left_semi").count()
    }
    val staleHits = recallOf(stale)

    // the migration: fresh books on the current corpus, full re-encode,
    // atomic swap over the live dir
    val retrained = Retrieval.retrain(docs1, emb1, live)
    assert(retrained.cents !== prior.cents,
      "retrain kept the stale coarse codebook")

    // retrained live dir ≡ a snapshot freshly trained on this corpus
    val fresh = Retrieval.build(docs1, emb1, s"$root/fresh")
    assert(retrained.cents === fresh.cents && retrained.books === fresh.books)
    val queries = Seq(0L -> Seq("spark", "join"), 1L -> Seq("vector", "table"))
    for (p <- Seq[HybridOps.Fusion](HybridOps.Rrf, HybridOps.LexicalOnly,
        HybridOps.DenseOnly))
      assert(rows(retrained.search(queries, 5, p)) ===
        rows(fresh.search(queries, 5, p)),
        s"retrained live dir diverges from a fresh-trained snapshot under $p")

    // recall recovered: books trained on the drifted corpus find the
    // true neighbors the stale books lost
    val retrainedHits = recallOf(retrained)
    assert(retrainedHits > staleHits,
      s"retrain did not improve recall: stale=$staleHits retrained=$retrainedHits")

    // the retrained publish carries fresh dh/vh: the NEXT rebuild is
    // incremental again (untouched buckets not rewritten, serve exact)
    def pbDirs(frame: String) = new java.io.File(s"$live/$frame").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("pb=")).toSeq
    val pbBefore = Seq("emb", "vh", "tf", "dl", "dh", "ctf", "cdl", "cemb")
      .map(f => f -> pbDirs(f).map(d => d.getName -> d.lastModified()).toMap)
      .toMap
    val docs2 = docs1.withColumn("text", when(col("doc_id") < 2,
      concat(col("text"), lit(" post-retrain crawl"))).otherwise(col("text")))
    val emb2 = emb1.withColumn("embedding", when(col("vec_id") < 2,
      reverse(col("embedding"))).otherwise(col("embedding")))
    val after = Retrieval.rebuild(docs2, emb2, live)
    assert(after.cents === retrained.cents && after.books === retrained.books,
      "post-retrain rebuild retrained again")
    val touchedPb = (0L until 2L).map(p => s"pb=$p").toSet
    for (f <- Seq("emb", "vh", "tf", "dl", "dh", "ctf", "cdl", "cemb");
        d <- pbDirs(f) if !touchedPb.contains(d.getName))
      assert(d.lastModified() == pbBefore(f)(d.getName),
        s"$f/${d.getName} rewritten by a post-retrain delta that never touched it")
    val wantAfter = Retrieval.build(docs2, emb2, s"$root/after",
      codebooks = Some((retrained.cents, retrained.books)))
    assert(rows(after.search(queries, 5)) === rows(wantAfter.search(queries, 5)))

    // retrain is a migration: refuses a dir that was never published
    val ex = intercept[IllegalArgumentException] {
      Retrieval.retrain(docs1, emb1, s"$root/never-built")
    }
    assert(ex.getMessage.contains("not a live retrieval snapshot"))
  }

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

  test("compact rewrites fragmented partitions to single files without changing a row") {
    val root = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // a WIDE build writes one file per task per partition value — the
    // fragmentation compact exists for; force it with explicit input
    // parallelism so the test holds under any suite session width
    val d = docs.where(col("doc_id") < 80).repartition(4)
    val e = emb.where(col("vec_id") < 80).repartition(4)
    val dir = s"$root/snap"
    val h = Retrieval.build(d, e, dir)
    def fileCounts(): Map[(String, String), Int] =
      h.chunkArtifactStats().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getInt(3)).toMap
    val before = fileCounts()
    val fragmented = before.filter(_._2 > 1).keySet
    assert(fragmented.nonEmpty,
      "wide build produced no fragmented partition; compact test vacuous")
    val queries = Seq(0L -> Seq("spark", "join"))
    val serveBefore = rows(h.searchChunks(queries, 5, refine = Some(8)))
    val cindexBefore = spark.read.parquet(s"$dir/cindex")
      .collect().map(_.toSeq).sortBy(_.toString)

    val rewritten = h.compact().toSet
    // exactly the fragmented chunk partitions were rewritten (compact
    // covers every merge frame; the chunk stats see the chunk ones)
    assert(fragmented.map { case (f, p) => (f, p) }
      .forall(fp => rewritten.contains(fp)),
      s"fragmented $fragmented not all rewritten: $rewritten")
    val after = fileCounts()
    assert(after.values.forall(_ == 1), s"still fragmented: $after")
    // rows and serves are bit-identical; only the file layout changed
    assert(spark.read.parquet(s"$dir/cindex")
      .collect().map(_.toSeq).sortBy(_.toString) === cindexBefore)
    assert(rows(Retrieval.load(spark, dir)
      .searchChunks(queries, 5, refine = Some(8))) === serveBefore)
    // idempotent: a second compact finds nothing to do
    assert(h.compact().isEmpty)
  }

  test("maintain: one pass compacts, meters shipped-point recall, and flags retrain against the floor") {
    val root = java.nio.file.Files.createTempDirectory("graft-maint").toString
    val d = docs.where(col("doc_id") < 80).repartition(4)
    val e = emb.where(col("vec_id") < 80).repartition(4)
    val h = Retrieval.build(d, e, s"$root/snap")
    val qids = (0L until 10L).toSeq
    // independent reference for the meter: measureRecall at the same
    // shipped grid point
    val want = h.measureRecall(qids, 3, nprobes = Seq(2),
        refines = Seq(VectorOps.RefineShortlist))
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap

    val wantBpe = h.measureRecall(qids, 3, nprobes = Seq(2),
        refines = Seq(VectorOps.RefineShortlist), bpeWindows = true)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap

    val rep = h.maintain(qids, 3)
    // the wide build fragmented at least one partition; maintain's
    // compact pass rewrote it (same trigger/action as compact())
    assert(rep.compacted.nonEmpty,
      "wide build produced nothing to compact; maintain test is weak")
    assert(rep.docRefineRecall === want("doc_refine"))
    assert(rep.chunkRefineRecall === Some(want("chunk_refine")))
    // the v6 snapshot meters the BPE chunk serve at its own window
    // unit; the doc family is meter-independent (same rows both runs)
    assert(rep.bpeChunkRefineRecall === Some(wantBpe("chunk_refine")))
    assert(wantBpe("doc_refine") === want("doc_refine"))
    // default floor 0.0 never recommends; an impossible floor always
    // does — the boundary an operator sizes from the snapshot's curve
    assert(!rep.retrainRecommended)
    val rep2 = h.maintain(qids, 3, recallFloor = 1.1)
    assert(rep2.retrainRecommended)
    assert(rep2.compacted.isEmpty, "second maintain found new fragments")
    // the pass changed no serve result
    val queries = Seq(0L -> Seq("spark", "join"))
    assert(rows(Retrieval.load(spark, s"$root/snap")
      .searchChunks(queries, 5, refine = Some(8))).nonEmpty)

    // serve-point selection: with a floor the meter runs the full grid
    // once and the report carries the cheapest qualifying point — it
    // must agree with cheapestServePoint over an independently measured
    // full-grid frame, meet the floor, and cost no more than the
    // shipped point (which qualifies by construction at this floor)
    val floor = rep.docRefineRecall
    val rep3 = h.maintain(qids, 3, servePointFloor = Some(floor))
    val sp = rep3.servePoint.getOrElse(
      fail("no serve point at a floor the shipped point meets"))
    assert(sp.method == "doc_refine" && sp.recall >= floor)
    val n = e.count()
    assert(sp.bytesPerQuery <=
      graft.serve.Retrieval.servePointCost(2, VectorOps.RefineShortlist,
        n, h.cents.size) + 1e-9)
    val independent = Retrieval.cheapestServePoint(
      h.measureRecall(qids, 3), "doc_refine", floor, n, h.cents.size)
    assert(independent === rep3.servePoint,
      "maintain's serve point diverges from the standalone selector")
    // shipped-point recalls read off the full-grid pass unchanged
    assert(rep3.docRefineRecall === rep.docRefineRecall)
    assert(rep3.chunkRefineRecall === rep.chunkRefineRecall)
  }

  test("maintain: per-family serve points — chunk and BPE select from their own grids at their own cost scale") {
    val root = java.nio.file.Files.createTempDirectory("graft-mfam").toString
    val d = docs.where(col("doc_id") < 80)
    val e = emb.where(col("vec_id") < 80)
    val h = Retrieval.build(d, e, s"$root/snap")
    val qids = (0L until 8L).toSeq
    // floor = the families' own shipped-point recall, so the shipped
    // point qualifies by construction and a pick must exist
    val base = h.maintain(qids, 3)
    val floor = math.min(base.chunkRefineRecall.get,
      base.bpeChunkRefineRecall.get)
    val rep = h.maintain(qids, 3, servePointFloor = Some(floor),
      servePointFamilies = Seq("chunk", "bpe"))
    // doc was not selected: metered at the shipped point only, no pick
    assert(rep.servePoint.isEmpty,
      "doc pick appeared though doc was not in servePointFamilies")
    assert(rep.docRefineRecall === base.docRefineRecall)
    val cs = rep.chunkServePoint.getOrElse(fail("no chunk serve point"))
    val bs = rep.bpeServePoint.getOrElse(fail("no BPE serve point"))
    assert(cs.method == "chunk_refine" && cs.recall >= floor)
    assert(bs.method == "chunk_refine" && bs.recall >= floor)
    // each family prices against ITS OWN index rows (chunk serves scan
    // chunk codes, not doc vectors) and must cost no more than the
    // shipped point, which qualifies at this floor
    val rShip = math.max(3, VectorOps.RefineShortlist)
    val nChunk = spark.read.parquet(s"$root/snap/cindex").count()
    val nBpe = spark.read.parquet(s"$root/snap/bcindex").count()
    assert(cs.bytesPerQuery <=
      graft.serve.Retrieval.servePointCost(2, rShip, nChunk,
        h.cents.size) + 1e-9)
    assert(bs.bytesPerQuery <=
      graft.serve.Retrieval.servePointCost(2, rShip, nBpe,
        h.cents.size) + 1e-9)
    // and each agrees with the standalone selector over an
    // independently measured full grid of its own family
    val indC = Retrieval.cheapestServePoint(
      h.measureRecall(qids, 3, families = Seq("chunk")),
      "chunk_refine", floor, nChunk, h.cents.size)
    val indB = Retrieval.cheapestServePoint(
      h.measureRecall(qids, 3, bpeWindows = true,
        families = Seq("chunk")),
      "chunk_refine", floor, nBpe, h.cents.size)
    assert(indC === rep.chunkServePoint,
      "chunk serve point diverges from the standalone selector")
    assert(indB === rep.bpeServePoint,
      "BPE serve point diverges from the standalone selector")
  }

  test("serve points: accepted picks persist as a sidecar, become the serving defaults, and explicit args still win") {
    val root = java.nio.file.Files.createTempDirectory("graft-spin").toString
    val d = docs.where(col("doc_id") < 80)
    val e = emb.where(col("vec_id") < 80)
    val dir = s"$root/snap"
    val h = Retrieval.build(d, e, dir)
    val qids = (0L until 8L).toSeq
    // a report with no picks must refuse, not silently no-op
    assertThrows[IllegalArgumentException](
      h.acceptServePoints(h.maintain(qids, 3)))
    // the REAL loop: maintain selects, accept persists, a reloaded
    // handle reads the pin back verbatim
    val base = h.maintain(qids, 3)
    val floor = Seq(base.docRefineRecall, base.chunkRefineRecall.get,
      base.bpeChunkRefineRecall.get).min
    val rep = h.maintain(qids, 3, servePointFloor = Some(floor),
      servePointFamilies = Seq("doc", "chunk", "bpe"))
    val pinned = h.acceptServePoints(rep)
    assert(pinned.toSet === Set("doc", "chunk", "bpe"))
    val h2 = Retrieval.load(spark, dir)
    assert(h2.pinnedServePoints === Map(
      "doc" -> ((rep.servePoint.get.nprobe, rep.servePoint.get.r)),
      "chunk" -> ((rep.chunkServePoint.get.nprobe,
        rep.chunkServePoint.get.r)),
      "bpe" -> ((rep.bpeServePoint.get.nprobe, rep.bpeServePoint.get.r))))
    // overwrite with a pick DELIBERATELY off the shipped constants so
    // "applied" is distinguishable in the physical plan (nprobe=1
    // probes one cell per query where the shipped default probes two;
    // r=3 refines a 3-row shortlist, not 40)
    h2.acceptServePoints(Retrieval.MaintenanceReport(Nil, 0.0, None,
      None, 0.0, retrainRecommended = false,
      servePoint = Some(Retrieval.ServePoint("doc_refine", 1, 3, 1.0, 0.0)),
      chunkServePoint =
        Some(Retrieval.ServePoint("chunk_refine", 1, 8, 1.0, 0.0)),
      bpeServePoint =
        Some(Retrieval.ServePoint("chunk_refine", 1, 8, 1.0, 0.0))))
    val hp = Retrieval.load(spark, dir)
    // job-level: the default serve's probed-cell partition filter IS
    // the pinned nprobe's (one cell for one query), not the shipped
    // two — and the default results equal the explicit-knob serve
    def cellList(df: DataFrame): Seq[String] = {
      // a single-cell probe optimizes IN (x) to = x — match both
      val plan = df.queryExecution.executedPlan.toString
      "cell#\\d+L? IN \\(([^)]*)\\)".r.findFirstMatchIn(plan)
        .map(_.group(1).split(",").map(_.trim).toSeq)
        .orElse("\\(cell#\\d+L? = (-?\\d+)\\)".r.findFirstMatchIn(plan)
          .map(m => Seq(m.group(1))))
        .getOrElse(fail("no probed-cell filter in the plan"))
    }
    val q1 = Seq(qids.head)
    val defaultServe = hp.denseTopK(q1, 3)
    assert(cellList(defaultServe) === cellList(hp.denseTopK(q1, 3, 1, 3)),
      "default serve's probed cells are not the pinned point's")
    assert(cellList(defaultServe).size === 1 &&
        cellList(hp.denseTopK(q1, 3, 2, 40)).size === 2,
      "pinned nprobe=1 must probe one cell where shipped probes two")
    assert(rows(defaultServe) === rows(hp.denseTopK(q1, 3, 1, 3)))
    assert(rows(hp.search(Seq(qids.head -> Seq("spark", "join")), 5))
        === rows(hp.search(Seq(qids.head -> Seq("spark", "join")), 5,
          nprobe = 1)))
    // chunk + BPE defaults resolve their pinned (nprobe, refine) —
    // the pinned r>0 turns the refine ON (the plan reads cemb/bcemb)
    val cq = Seq(qids.head -> Seq("spark", "join"))
    assert(rows(hp.searchChunks(cq, 5))
        === rows(hp.searchChunks(cq, 5, nprobe = 1, refine = Some(8))))
    assert(rows(hp.searchBpeChunks(cq, 5))
        === rows(hp.searchBpeChunks(cq, 5, nprobe = 1, refine = Some(8))))
    // explicit args beat the pin everywhere
    assert(rows(hp.denseTopK(q1, 3, 2, 40))
        === rows(h.denseTopK(q1, 3, 2, 40)))
    // a full build republishes the snapshot directory and CLEARS the
    // pin (new codebooks void the old measurement); rebuild keeps it
    Retrieval.rebuild(d, e, dir)
    assert(Retrieval.load(spark, dir).pinnedServePoints.nonEmpty,
      "in-place rebuild must keep the accepted pin")
    Retrieval.build(d, e, dir)
    assert(Retrieval.load(spark, dir).pinnedServePoints.isEmpty,
      "full build must clear the accepted pin")
  }

  test("serve points: a partial re-meter's accept merges over earlier pins instead of dropping them") {
    val root = java.nio.file.Files.createTempDirectory("graft-spmrg").toString
    val d = docs.where(col("doc_id") < 60)
    val e = emb.where(col("vec_id") < 60)
    val dir = s"$root/snap"
    val h = Retrieval.build(d, e, dir)
    def rep(doc: Option[(Int, Int)], chunk: Option[(Int, Int)],
        bpe: Option[(Int, Int)]) =
      Retrieval.MaintenanceReport(Nil, 0.0, None, None, 0.0,
        retrainRecommended = false,
        servePoint = doc.map { case (np, r) =>
          Retrieval.ServePoint("doc_refine", np, r, 1.0, 0.0) },
        chunkServePoint = chunk.map { case (np, r) =>
          Retrieval.ServePoint("chunk_refine", np, r, 1.0, 0.0) },
        bpeServePoint = bpe.map { case (np, r) =>
          Retrieval.ServePoint("chunk_refine", np, r, 1.0, 0.0) })
    // full accept pins all three families
    h.acceptServePoints(rep(Some((1, 3)), Some((1, 8)), Some((2, 9))))
    // a PARTIAL re-meter (doc only) must refresh doc and keep the
    // chunk/bpe pins serving — not silently revert them to shipped
    assert(Retrieval.load(spark, dir)
      .acceptServePoints(rep(Some((3, 7)), None, None)) === Seq("doc"))
    assert(Retrieval.load(spark, dir).pinnedServePoints === Map(
      "doc" -> ((3, 7)), "chunk" -> ((1, 8)), "bpe" -> ((2, 9))),
      "partial accept dropped previously accepted families' pins")
  }

  test("screenIngest: a counting frame whose in-frame pin disagrees with the sidecar falls back to the dh derivation") {
    val root = java.nio.file.Files.createTempDirectory("graft-cntpin")
      .toString
    val live = s"$root/snap"
    val d = docs.where(col("doc_id") < 150)
    val e = emb.where(col("vec_id") < 150)
    Retrieval.build(d, e, live, countingIngestFilter = true)
    val probe = d.limit(25)
    def verdicts() = Retrieval.load(spark, live).screenIngest(probe)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val healthy = verdicts()
    assert(healthy.nonEmpty && healthy.values.forall(identity))
    // corrupt the FRAME's pin only (sidecar untouched): rewrite the
    // cnt column under a different pinned geometry — the load path
    // must treat pin ≠ sidecar as a doubt and derive from dh, never
    // surface the geometry refusal at the first screen
    val frame = spark.read.parquet(s"$live/bloomdh")
      .select(col("shard").cast("long").as("shard"), col("pos"),
        col("cnt")).collect()
    val sidecarBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(live, "bloomdh", "_bloomgeom"))
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete(); ()
    }
    rmr(new java.io.File(s"$live/bloomdh"))
    import spark.implicits._
    val badPin = graft.operators.Dedup.shardedCountingBloomBits(
      Seq("z").toDF("text").select(md5(col("text")).as("content_key")),
      shards = 1, mbits = 64)
      .schema.fields.find(_.name == "cnt").get.metadata
    spark.createDataFrame(
      spark.sparkContext.parallelize(frame.toSeq),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = true, badPin))))
      .write.parquet(s"$live/bloomdh")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(live, "bloomdh", "_bloomgeom"), sidecarBytes)
    assert(verdicts() === healthy,
      "pin-mismatched frame must fall back to the verdict-identical " +
        "dh derivation, not throw or serve wrong-geometry positions")
  }

  test("maintain: counting-backed snapshot surfaces ingest-filter health; bit-backed carries none") {
    val root = java.nio.file.Files.createTempDirectory("graft-cnthl").toString
    val d = docs.where(col("doc_id") < 80)
    val e = emb.where(col("vec_id") < 80)
    val qids = (0L until 6L).toSeq
    val hc = Retrieval.build(d, e, s"$root/cnt", countingIngestFilter = true)
    val repC = hc.maintain(qids, 3)
    val st = repC.ingestFilterStats.getOrElse(
      fail("counting-backed maintain must carry filter health"))
    // the exact-live-count contract: Σcnt = khash·n recovers the key
    // multiset size with no estimation — here the corpus row count
    // (every fixture text non-null)
    assert(st.estimatedKeys === d.count(),
      "counting stats' live count must be EXACT")
    assert(st.fillRatio > 0.0 && st.fillRatio < 1.0)
    assert(repC.ingestFilterResizeRecommended === (st.fillRatio > 0.5))
    // adaptive geometry sizes 10 bits/key, so a fresh build sits well
    // under the half-full resize trigger — and no recommendation rides
    assert(!repC.ingestFilterResizeRecommended &&
      repC.ingestFilterRecommendedGeometry.isEmpty)
    // bit flavor: regenerated at adaptive geometry per rebuild — no
    // silent-outgrowth hazard, no health block
    val hb = Retrieval.build(d, e, s"$root/bit")
    val repB = hb.maintain(qids, 3)
    assert(repB.ingestFilterStats.isEmpty &&
      !repB.ingestFilterResizeRecommended &&
      repB.ingestFilterRecommendedGeometry.isEmpty,
      "bit-backed maintain must not fabricate counting health")
  }

  test("maintain: a selected family with absent frames is reported, never silently skipped") {
    val root = java.nio.file.Files.createTempDirectory("graft-sabs").toString
    val d = docs.where(col("doc_id") < 60)
    val e = emb.where(col("vec_id") < 60)
    val dir = s"$root/snap"
    val h = Retrieval.build(d, e, dir)
    // simulate a pre-v6 snapshot: drop the BPE frames
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(dir, "bcindex"))
    rm(new java.io.File(dir, "bcemb"))
    val qids = (0L until 6L).toSeq
    val rep = Retrieval.load(spark, dir).maintain(qids, 3,
      servePointFloor = Some(0.0),
      servePointFamilies = Seq("doc", "bpe"))
    assert(rep.servePoint.isDefined, "doc pick must still select")
    assert(rep.bpeServePoint.isEmpty)
    assert(rep.servePointFramesAbsent === Seq("bpe"),
      "the explicitly selected bpe family's absent frames must be " +
        "reported so its None is unambiguous")
    // an attainable-floor run with all frames present reports nothing
    assert(rep.servePointFramesAbsent.intersect(Seq("doc")).isEmpty)
  }

  test("cheapestServePointOf: corpus-scale cost picks the documented shipped point at floor 0.6") {
    // the measured sf0.1 x91 doc-refine column at nprobe=2
    // (0.352/0.500/0.628 for r=10/20/40 — PipelinePack's x91 note);
    // wider-probe rows are representative fill with higher recall, the
    // shape every measured curve has shown
    val curve = Seq(
      ("doc_refine", 1, 40, 0.55),
      ("doc_refine", 2, 10, 0.352), ("doc_refine", 2, 20, 0.500),
      ("doc_refine", 2, 40, 0.628),
      ("doc_refine", 4, 20, 0.70), ("doc_refine", 4, 40, 0.74),
      ("doc_refine", 8, 20, 0.75), ("doc_refine", 8, 40, 0.82),
      ("doc_adc", 8, 0, 0.40))
    // at corpus scale the scan-fraction term dominates: probe widening
    // costs ~n/cells code reads per step while refine costs r·Dim·4
    // bytes — exactly the "quarter of the probed bandwidth" trade the
    // shipped default was justified by, so floor 0.6 lands on (2, 40)
    val n = 1_000_000_000L
    val cells = 31623 // ≈ √n, the adaptive shape
    val got = graft.serve.Retrieval.cheapestServePointOf(
      curve, "doc_refine", 0.6, n, cells).get
    assert((got.nprobe, got.r) === ((2, 40)), s"picked $got")
    assert(got.recall === 0.628)
    // a higher floor moves along the curve to the cheapest qualifier...
    val hi = graft.serve.Retrieval.cheapestServePointOf(
      curve, "doc_refine", 0.75, n, cells).get
    assert((hi.nprobe, hi.r) === ((8, 20)), s"picked $hi")
    // ...an unreachable floor returns None (retrain territory, not a
    // knob turn), and other methods' rows never leak into the pick
    assert(graft.serve.Retrieval.cheapestServePointOf(
      curve, "doc_refine", 0.9, n, cells).isEmpty)
    assert(graft.serve.Retrieval.cheapestServePointOf(
      curve, "doc_adc", 0.39, n, cells).get.r === 0)
    // at FIXTURE scale the refine term competes: on the real sf0.01
    // grid (2,20) ties (2,40) at equal recall and wins on cost — the
    // same selector, the n-dependence is the point of the model
    val tiny = graft.serve.Retrieval.cheapestServePointOf(
      Seq(("doc_refine", 2, 20, 0.640), ("doc_refine", 2, 40, 0.640)),
      "doc_refine", 0.6, 500L, 32).get
    assert((tiny.nprobe, tiny.r) === ((2, 20)), s"picked $tiny")
  }

  test("measureRecall families: a scoped pass meters only its family and skips the other's brute baseline") {
    val root = java.nio.file.Files.createTempDirectory("graft-fams").toString
    val d = docs.where(col("doc_id") < 60)
    val e = emb.where(col("vec_id") < 60)
    val h = Retrieval.build(d, e, s"$root/snap")
    val qids = (0L until 6L).toSeq

    def jobsOf(tag: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(tag, tag, false)
      try body finally spark.sparkContext.clearJobGroup()
      // the status store fills asynchronously — poll until stable
      var prev = -1
      var cur = spark.sparkContext.statusTracker.getJobIdsForGroup(tag).length
      var waited = 0
      while ((cur != prev || cur == 0) && waited < 5000) {
        Thread.sleep(200); waited += 200
        prev = cur
        cur = spark.sparkContext.statusTracker.getJobIdsForGroup(tag).length
      }
      cur
    }

    // row scoping: each family's rows and no other's
    val chunkOnly = h.measureRecall(qids, 3, nprobes = Seq(2),
      refines = Seq(VectorOps.RefineShortlist), families = Seq("chunk"))
      .collect()
    assert(chunkOnly.nonEmpty &&
      chunkOnly.forall(_.getString(0).startsWith("chunk_")))
    val docOnly = h.measureRecall(qids, 3, nprobes = Seq(2),
      refines = Seq(VectorOps.RefineShortlist), families = Seq("doc"))
      .collect()
    assert(docOnly.nonEmpty &&
      docOnly.forall(_.getString(0).startsWith("doc_")))

    // job scoping: the chunk-only pass must run strictly fewer jobs
    // than the full pass — the skipped work IS the brute doc baseline
    // maintain()'s BPE pass used to recompute
    val jBoth = jobsOf("meter-both") {
      h.measureRecall(qids, 3, nprobes = Seq(2),
        refines = Seq(VectorOps.RefineShortlist)).collect(); ()
    }
    val jChunk = jobsOf("meter-chunk") {
      h.measureRecall(qids, 3, nprobes = Seq(2),
        refines = Seq(VectorOps.RefineShortlist),
        families = Seq("chunk")).collect(); ()
    }
    assert(jChunk < jBoth, s"chunk-only ran $jChunk jobs vs $jBoth full")

    // the scoped rows equal the full pass's rows of that family —
    // scoping changes cost, never values
    val both = h.measureRecall(qids, 3, nprobes = Seq(2),
      refines = Seq(VectorOps.RefineShortlist)).collect()
    assert(chunkOnly.map(_.toSeq).toSet ===
      both.filter(_.getString(0).startsWith("chunk_")).map(_.toSeq).toSet)
    assert(docOnly.map(_.toSeq).toSet ===
      both.filter(_.getString(0).startsWith("doc_")).map(_.toSeq).toSet)
  }

  test("maintain on a pre-chunk-layout snapshot: heal and compact still run, doc meter reports, chunk meters degrade to None") {
    val root = java.nio.file.Files.createTempDirectory("graft-prev5").toString
    val d = docs.where(col("doc_id") < 60).repartition(4)
    val e = emb.where(col("vec_id") < 60).repartition(4)
    val dir = s"$root/snap"
    Retrieval.build(d, e, dir)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    // simulate a pre-v5 snapshot: no chunk-vector frames at all
    Seq("cemb", "cindex", "bcemb", "bcindex")
      .foreach(f => rm(new java.io.File(s"$dir/$f")))
    val h = Retrieval.load(spark, dir)
    val rep = h.maintain((0L until 6L).toSeq, 3)
    // the runbook survived the old layout: compact ran (wide build
    // fragmentation) and the doc meter reported; the chunk meters are
    // None instead of the whole call throwing away heal + compact
    assert(rep.compacted.nonEmpty, "compact skipped on a v4 snapshot")
    assert(rep.docRefineRecall >= 0.0 && rep.docRefineRecall <= 1.0)
    assert(rep.chunkRefineRecall.isEmpty)
    assert(rep.bpeChunkRefineRecall.isEmpty)
    assert(!rep.retrainRecommended)
  }

  test("adaptive cell count: build sizes cells ≈ √n and persists them; maintain recommends migration on ≥4× drift; retrain re-derives") {
    // the derivation and its clamps (mirrored bit-for-bit by
    // adaptiveCellsSql — round of √integer can't land on .5)
    assert(VectorOps.adaptiveCells(500) === 22)
    assert(VectorOps.adaptiveCells(2000) === 45) // the sf0.1 build's pick
    assert(VectorOps.adaptiveCells(4) === 16) // clamp floor
    assert(VectorOps.adaptiveCells(10_000_000_000L) === 65536) // ceiling
    val root = java.nio.file.Files.createTempDirectory("graft-acell").toString
    val qids = (0L until 4L).toSeq

    // a build over the 500-vector fixture trains √500 ≈ 22 cells and
    // the count round-trips through the persisted codebook
    val h = Retrieval.build(docs, emb, s"$root/snap")
    assert(h.cents.size === 22)
    assert(Retrieval.load(spark, s"$root/snap").cents.size === 22)
    // no drift: 500 sits inside [22²/4, 4·22²]
    val rep = h.maintain(qids, 3)
    assert(rep.trainedCells === 22 && rep.liveVectors === 500L)
    assert(rep.recommendedCells === 22)
    assert(!rep.cellMigrationRecommended)

    // a snapshot pinned to a 4-cell codebook has outgrown its trained
    // k² by 4×+ over the same corpus: maintain recommends the
    // migration, sized ≈ √n — exactly what a retrain would train
    val cents4 = VectorOps.trainedCentroids(emb, 4)
    val books4 = VectorOps.pqResidualCodebooks(emb, cents4)
    val h4 = Retrieval.build(docs, emb, s"$root/snap4",
      codebooks = Some((cents4, books4)))
    val rep4 = h4.maintain(qids, 3)
    assert(rep4.trainedCells === 4)
    assert(rep4.cellMigrationRecommended && rep4.recommendedCells === 22)
    // retrain IS the migration: it re-derives cells from the corpus as
    // it is now, so the 4-cell snapshot comes back at 22
    val hr = Retrieval.retrain(docs, emb, s"$root/snap4")
    assert(hr.cents.size === 22)
    assert(!hr.maintain(qids, 3).cellMigrationRecommended)

    // explicit cells override the derivation; cells + codebooks refuse
    val h8 = Retrieval.build(docs, emb, s"$root/snap8", cells = Some(8))
    assert(h8.cents.size === 8)
    val ex = intercept[IllegalArgumentException] {
      Retrieval.build(docs, emb, s"$root/bad",
        codebooks = Some((cents4, books4)), cells = Some(8))
    }
    assert(ex.getMessage.contains("not both"), s"wrong failure: $ex")
    // an EXPLICIT cell count is an operator decision: 500 vectors on
    // an 8-cell snapshot is ≥4× past k²=64, but the pin suppresses the
    // nag the override deliberately declined (pinned CODEBOOKS — h4
    // above — still drift-check: outgrowing them is what retrain is
    // for). An adaptive retrain clears the pin with the snapshot dir.
    val rep8 = h8.maintain(qids, 3)
    assert(rep8.cellsPinned && !rep8.cellMigrationRecommended,
      s"pinned cells nagged: $rep8")
    val hr8 = Retrieval.retrain(docs, emb, s"$root/snap8")
    val repr8 = hr8.maintain(qids, 3)
    assert(hr8.cents.size === 22 && !repr8.cellsPinned)
  }

  test("maintain with a serve-point floor survives k between the grid refines; chunk meters stay at the shipped point") {
    val root = java.nio.file.Files.createTempDirectory("graft-mfloor").toString
    val h = Retrieval.build(docs, emb, s"$root/snap")
    // k=15 sits between CurveRefines' 10 and 20 — the wide grid must
    // drop the sub-k refine instead of tripping recallCurveFrom's
    // r >= k requirement mid-runbook (after compact already ran)
    val rep = h.maintain((0L until 4L).toSeq, 15,
      servePointFloor = Some(0.0))
    assert(rep.servePoint.isDefined, "floor 0.0 must always pick a point")
    assert(rep.docRefineRecall >= 0.0 && rep.chunkRefineRecall.isDefined)
  }

  test("per-frame chunk guard: a snapshot missing only cemb still serves every non-refine chunk query") {
    val root = java.nio.file.Files.createTempDirectory("graft-frameguard").toString
    val d = docs.where(col("doc_id") < 60)
    val e = emb.where(col("vec_id") < 60)
    val dir = s"$root/snap"
    Retrieval.build(d, e, dir)
    val want = rows(Retrieval.load(spark, dir)
      .searchChunks(Seq(0L -> Seq("spark", "join")), 5))

    // simulate a v4 snapshot mid-migration: cemb/ absent
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(s"$dir/cemb"))
    val h = Retrieval.load(spark, dir)
    // plain ADC chunk serve never reads cemb — must keep serving
    assert(rows(h.searchChunks(Seq(0L -> Seq("spark", "join")), 5)) === want)
    // only the refine path (the one reader of cemb) fails, with the
    // upgrade message naming the missing frame
    val msg = intercept[IllegalArgumentException] {
      h.searchChunks(Seq(0L -> Seq("spark", "join")), 5, refine = Some(8))
        .collect()
    }.getMessage
    assert(msg.contains("cemb"), msg)
  }
}
