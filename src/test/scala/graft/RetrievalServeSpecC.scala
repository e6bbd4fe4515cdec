package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HybridOps, TextOps, VectorOps}
import graft.serve.Retrieval

/** [[RetrievalServeSpec]] part C (compact/maintain/serve-point tests)
  * — split for parallel forked-group execution; same coverage, no test
  * renamed or dropped. The snapshot serve surface: build/load/search must compose the
  * audited halves verbatim, so every serve is equivalence-comparable
  * to the in-memory builds — and the publish must be atomic-replace. */
class RetrievalServeSpecC extends AnyFunSuite with SparkSpec {

  private lazy val docs = graft.sources.Tables.documents(spark, sf)
    .select("doc_id", "text").cache()
  private lazy val emb = graft.sources.Tables.embeddings(spark, sf)
    .select("vec_id", "embedding").cache()

  private def rows(df: DataFrame) =
    df.orderBy("query_id", "rn").collect().map(_.toSeq).toSeq

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
