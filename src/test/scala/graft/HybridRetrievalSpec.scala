package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HybridOps, TextOps, VectorOps}

/** Pins [[HybridOps]]' reciprocal-rank fusion against an independent
  * driver-side reference: RRF computed here in plain Scala from the two
  * collected top-k lists, exact integer arithmetic both sides. */
class HybridRetrievalSpec extends AnyFunSuite with SparkSpec {

  private val K = 5
  private val Queries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "join"),
    1L -> Seq("vector", "table"),
    2L -> Seq("window", "batch", "scan"))

  test("rrfDenom is divisible by every fused denominator") {
    val d = HybridOps.rrfDenom(K)
    (1 to K).foreach { r =>
      assert(d % (HybridOps.RrfK + r) === 0L, s"rank $r denominator must divide")
    }
    // and stays comfortably inside exact-double territory (the Spark
    // side divides as double before the long cast)
    assert(d < (1L << 53))
  }

  test("hybrid fusion matches a driver-side RRF reference on the fixture corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val lex = TextOps.bm25TopK(docs, Queries, K)
      .select("query_id", "doc_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val dense = VectorOps.annTopK(emb, Queries.map(_._1), K)
      .select(col("query_id"), col("vec_id"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val d = HybridOps.rrfDenom(K)
    // independent reference: integer RRF over the union of both lists,
    // ranked per query by (score desc, doc_id asc), top K
    val want = (lex.keySet ++ dense.keySet).toSeq.map { case (q, id) =>
      val s = lex.get((q, id)).map(r => d / (HybridOps.RrfK + r)).getOrElse(0L) +
        dense.get((q, id)).map(r => d / (HybridOps.RrfK + r)).getOrElse(0L)
      (q, id, s)
    }.groupBy(_._1).flatMap { case (q, rows) =>
      rows.sortBy(t => (-t._3, t._2)).take(K).zipWithIndex
        .map { case ((_, id, s), i) => (q, id, s, i + 1) }
    }.toSet
    val got = HybridOps.hybridTopK(docs, emb, Queries, K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got === want)
    // every query produced a non-empty fused list
    assert(got.map(_._1) === Queries.map(_._1).toSet)
  }

  test("hybrid serve from streaming-built lexical artifact equals the batch build") {
    val docsAll = graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
    val embAll = graft.sources.Tables.embeddings(spark, sf)
    val cut = 250L
    val sl = new graft.streaming.StreamingLexical(
      java.nio.file.Files.createTempDirectory("hyb-art").toString)
    sl.indexBatch(docsAll.where(col("doc_id") < cut), 0)
    sl.indexBatch(docsAll.where(col("doc_id") >= cut), 1)
    val (tf, dl) = sl.artifact(spark).get
    // the dense side appends per-doc too: two arrival slices re-unioned
    val emb = embAll.where(col("vec_id") < cut)
      .unionByName(embAll.where(col("vec_id") >= cut))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rn").collect().map(_.toSeq).toSeq
    val got = rows(HybridOps.hybridTopKFrom(tf, dl, emb, Queries, K))
    val want = rows(HybridOps.hybridTopK(docsAll, embAll, Queries, K))
    assert(want.nonEmpty)
    assert(got === want, "artifact-served hybrid diverges from batch")
  }

  test("weighted fusion: min-max normalization, absent-half zeros, degenerate lists") {
    val sess = spark
    import sess.implicits._
    // query 0: two lex docs (scores 2.0 and 1.0), two dense (0.8, 0.4),
    // doc 11 in both; query 1: ONE doc in each list (degenerate min=max)
    val lex = Seq((0L, 10L, 2.0), (0L, 11L, 1.0), (1L, 20L, 3.0))
      .toDF("query_id", "doc_id", "score")
    val dense = Seq((0L, 11L, 0.8), (0L, 12L, 0.4), (1L, 21L, 0.9))
      .toDF("query_id", "doc_id", "cosine")
    val got = HybridOps.weightedFuse(lex, dense, 5)
      .orderBy("query_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // q0 normalized: lex 10→1.0, 11→0.0; dense 11→1.0, 12→0.0
    // fused: 10 = .5*1.0 = 0.5; 11 = .5*0 + .5*1 = 0.5; 12 = 0.0
    // tie at 0.5 → doc_id: 10 then 11
    // q1 degenerate singletons both normalize to 1.0 → each 0.5, 20 then 21
    assert(got.toSeq === Seq(
      (0L, 10L, 0.5, 1), (0L, 11L, 0.5, 2), (0L, 12L, 0.0, 3),
      (1L, 20L, 0.5, 1), (1L, 21L, 0.5, 2)))
  }

  test("a doc ranked by only one half still fuses (absent list contributes 0)") {
    // toy corpus engineered so the lexical and dense top lists disagree
    val sess = spark
    import sess.implicits._
    val lexIn = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("query_id", "doc_id", "rn")
    val denseIn = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("query_id", "doc_id", "rn")
    val got = HybridOps.rrfFuse(lexIn, denseIn, 3)
      .orderBy("rn").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    val d = HybridOps.rrfDenom(3)
    val s61 = d / 61; val s62 = d / 62
    // 11 appears in both lists (ranks 2 and 1) and must win
    assert(got.toSeq === Seq(
      (11L, s62 + s61, 1),
      (10L, s61, 2),
      (12L, s62, 3)))
  }

  test("filtered hybrid: every result allowed, pre-filter fills k, global stats preserved") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val (tf, dl) = TextOps.bm25Stats(docs.select("doc_id", "text"))
    val allowed = docs.where(col("lang") === "en").select("doc_id")
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    assert(allowedIds.nonEmpty && allowedIds.size < docs.count(),
      "filter not selective on this fixture; test is vacuous")
    val filtered = HybridOps.searchFiltered(tf, dl, emb, allowed, Queries, K)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // candidate restriction: every fused result is an allowed doc
    assert(filtered.nonEmpty)
    assert(filtered.forall { case (_, id) => allowedIds.contains(id) },
      s"disallowed doc in filtered results: $filtered")
    // non-vacuity: the filter really changed the ranking vs unfiltered
    val unfiltered = HybridOps.searchFrom(tf, dl, emb, Queries, K)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(filtered.toSet !== unfiltered.toSet,
      "filtered ≡ unfiltered; filter had no effect — vacuous")
    // PRE-filter semantics: the lexical half returns the true top-k
    // among allowed docs — a post-filter of the unfiltered top-k would
    // under-fill whenever fewer than k of the unfiltered top-k are
    // allowed. Assert against the independently computed reference.
    val lexFiltered = TextOps.bm25TopKFrom(tf, dl, Queries, K, Some(allowed))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(3))).toMap
    val lexAllRanked = TextOps.bm25TopKFrom(tf, dl, Queries, 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val wantLex = lexAllRanked.toSeq.filter(t => allowedIds.contains(t._2))
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy(_._3).take(K).zipWithIndex
          .map { case ((_, id, _), i) => (q, id) -> (i + 1) }
      }.toMap
    assert(lexFiltered === wantLex,
      "filtered lexical top-k is not the true top-k among allowed docs")
    // global stats: an allowed doc's score must be IDENTICAL to its
    // unfiltered score (the filter narrows candidates, never re-weights)
    val unfScores = TextOps.bm25TopKFrom(tf, dl, Queries, 1000000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val fScores = TextOps.bm25TopKFrom(tf, dl, Queries, K, Some(allowed))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(fScores.forall { case (k2, s) => unfScores(k2) == s },
      "filtering changed a surviving doc's score — stats not global")
  }
}

/** Round 7 lost three queries and 20 tests to a silent fixture
  * regeneration that flipped `events.ts` from TIMESTAMP(NANOS) to
  * µs/no-tz. These pin the canonicalization chokepoint so the NEXT
  * regeneration either normalizes silently or fails with one clear
  * message naming the file and flavor. */
class FixtureSchemaSpec extends AnyFunSuite with SparkSpec {

  test("every fixture column the engine relies on reads at its canonical type") {
    import graft.sources.Tables
    val ev = Tables.events(spark, sf)
    val want = Map(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    want.foreach { case (c, t) =>
      val f = ev.schema.find(_.name == c)
      assert(f.nonEmpty, s"events missing column $c")
      assert(f.get.dataType === t,
        s"events.$c normalized to ${f.get.dataType}, want $t")
    }
    val docs = Tables.documents(spark, sf)
    assert(docs.schema("doc_id").dataType === LongType)
    assert(docs.schema("text").dataType === StringType)
    val emb = Tables.embeddings(spark, sf)
    assert(emb.schema("vec_id").dataType === LongType)
    assert(emb.schema("embedding").dataType.isInstanceOf[ArrayType])
  }

  test("regenerated fixture with an unrecognized ts flavor fails loudly, naming the file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fixture").toString
    // a ts flavor the source layer has no canonicalization for
    val rows = java.util.Arrays.asList(Row(1L, 12.5), Row(2L, 13.5))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", DoubleType)))
    spark.createDataFrame(rows, schema).write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.sources.Tables.events(spark, dir)
    }
    assert(e.getMessage.contains(s"$dir/events.parquet"), e.getMessage)
    assert(e.getMessage.contains("DOUBLE"), e.getMessage)
    assert(e.getMessage.contains("normalizeTs"), e.getMessage)
  }

  test("both historical ts flavors normalize to session-tz TIMESTAMP with identical values") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-flavor").toString
    val micros = Seq(1704067200000000L, 1704070800000001L) // 2024-01-01 UTC
    // µs/no-tz flavor (round 7+): written as TIMESTAMP_NTZ parquet
    val sess = spark
    import sess.implicits._
    micros.toDF("us")
      .select(col("us").cast("long").as("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$dir/events.parquet")
    val ntz = Tables.events(spark, dir)
    assert(ntz.schema("ts").dataType === TimestampType)
    val gotNtz = ntz.select(unix_micros(col("ts"))).orderBy("ts")
      .collect().map(_.getLong(0)).toSeq
    assert(gotNtz === micros)
    // nanos-as-long flavor (rounds 1-6): normalizeTs floor-divides
    val nanos = micros.map(_ * 1000L + 999L).toDF("ts")
    val gotNanos = Tables.normalizeTs(nanos)
      .select(unix_micros(col("ts"))).orderBy("ts")
      .collect().map(_.getLong(0)).toSeq
    assert(gotNanos === micros, "nanos must truncate to the same micros")
  }
}
