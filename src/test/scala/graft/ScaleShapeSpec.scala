package graft

import graft.operators.{Analytics, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100×-scale shape pins: properties that are invisible at fixture
  * row counts but decide whether an operator survives a real cluster —
  * hub-degree aggregation buffers, quadratic candidate cliques,
  * checkpoint reliability, hot-key stragglers. Each test either pins the
  * PLAN (the dangerous node must not exist) or runs the adversarial
  * input shape at a size where the bad plan would visibly blow up. */
class ScaleShapeSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // --- duplicateClusters: hub-degree safety --------------------------------

  test("star contraction plans no CollectSet — per-row memory at any hub degree") {
    val e = Seq((5L, 1L), (7L, 1L)).toDF("u", "v")
    Seq(true, false).foreach { large =>
      val plan = Dedup.starContraction(e, large).queryExecution
      val txt = plan.executedPlan.toString + "\n" + plan.optimizedPlan.toString
      assert(!txt.contains("collect_set") && !txt.contains("CollectSet"),
        s"large=$large star half-round materializes a neighborhood buffer:\n$txt")
    }
  }

  test("a 100k-degree star hub contracts without a neighborhood buffer") {
    // one doc near-duplicated 10⁵ times: the boilerplate-hub shape that
    // OOMs a collect_set aggregation buffer at real corpus scale. With
    // min-agg + join-back this is per-row work and converges immediately
    // (the seed is already star-canonical).
    val pairs = spark.range(1, 100001)
      .select(lit(0L).as("doc_a"), col("id").as("doc_b"), lit(1.0).as("jaccard"))
    val labels = Dedup.duplicateClusters(pairs)
    assert(labels.where(col("cluster_id") =!= 0L).count() === 0L)
    assert(labels.count() === 100001L)
  }

  test("a 100k-member cluster selects its representative without a member buffer") {
    // the boilerplate-hub CLUSTER (the post-CC analog of the star hub):
    // quality rises with id so the argmax is the LAST member — worst
    // case for any plan that buffers members before choosing. The
    // struct-max aggregate map-side combines: per-task state is one
    // struct, member-count-independent.
    val clusters = spark.range(0, 100000)
      .select(col("id").as("doc_id"), lit(0L).as("cluster_id"))
    val quality = spark.range(0, 100000)
      .select(col("id").as("doc_id"),
        (col("id").cast("double") / 100000.0).as("uniq_ratio"))
    val reps = Dedup.clusterRepresentatives(clusters, quality)
    val qe = reps.queryExecution
    val txt = qe.executedPlan.toString + "\n" + qe.optimizedPlan.toString
    assert(!txt.contains("collect_set") && !txt.contains("CollectSet") &&
      !txt.contains("collect_list") && !txt.contains("CollectList") &&
      !txt.toLowerCase.contains("windowspecdefinition"),
      s"representative selection buffers members:\n$txt")
    val row = reps.collect()
    assert(row.length === 1)
    assert(row(0).getLong(1) === 99999L) // highest-quality member wins
    assert(row(0).getLong(3) === 100000L)
    // tie on quality → lowest doc_id (the deterministic tiebreak)
    val tied = Dedup.clusterRepresentatives(
      Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster_id"),
      Seq((1L, 0.5), (2L, 0.7), (3L, 0.7)).toDF("doc_id", "uniq_ratio"))
      .collect()
    assert(tied.length === 1 && tied(0).getLong(1) === 2L)
  }

  // --- LSH band-bucket occupancy cap ---------------------------------------

  test("a 1000-doc near-identical clique yields O(m·maxBucket) candidates, not m²/2") {
    // template + unique footer: the crawl shape (mirrored boilerplate)
    // that made the uncapped band join quadratic
    val template = ("the quick brown fox jumps over the lazy dog and then " +
      "proceeds to recite the entire corpus licensing boilerplate verbatim ") * 3
    val docs = spark.range(0, 1000)
      .select(col("id").as("doc_id"),
        concat(lit(template), lit("footer "), col("id")).as("text"))
    val sigs = Dedup.minHashSignatures(docs)
    val capped = Dedup.bandCandidates(sigs).count()
    val uncapped = Dedup.bandCandidates(sigs, maxBucket = Int.MaxValue).count()
    // uncapped: every band bucket holds ~the whole clique → ~m²/2 pairs
    assert(uncapped > 400000L, s"clique fixture is not adversarial (uncapped=$uncapped)")
    // capped: each surviving bucket contributes ≤ maxBucket²/2 pairs and
    // each doc sits in ≤ Bands buckets → ≤ m·Bands·maxBucket/2 candidates
    val bound = 1000L * Dedup.Bands * Dedup.MaxBandBucket / 2
    assert(capped <= bound, s"capped candidate count $capped exceeds bound $bound")
  }

  test("winnow fingerprint cap bounds a 1000-doc boilerplate clique at O(m·cap)") {
    // every fingerprint of the shared template occurs ~1000× — far past
    // MaxFpOcc — so the frequency band drops them BEFORE the self-join
    // (the documented boilerplate/recall trade); what survives is the
    // footer-adjacent fingerprints, each in ≤ MaxFpOcc docs, so pairs
    // are bounded by Σocc² over surviving fingerprints, never m²/2
    // template pairs
    val template = ("the quick brown fox jumps over the lazy dog and then " +
      "proceeds to recite the entire corpus licensing boilerplate verbatim ") * 3
    val docs = spark.range(0, 1000)
      .select(col("id").as("doc_id"),
        concat(lit(template), lit("footer "), col("id")).as("text"))
    val capped = Dedup.winnowPairs(docs).count()
    assert(capped < 20000L,
      s"capped clique pairs not bounded: $capped (template fps leaked past the band)")
    // same shape with the cap lifted: the clique explodes — proving the
    // fixture is adversarial and the band is what bounds it
    assert(Dedup.winnowPairs(docs, maxOcc = Int.MaxValue).count() > 400000L)
  }

  test("bucket cap keeps pair results identical when no bucket exceeds it") {
    // the fixture-scale guarantee behind x2/x3/x16/x22/x25/x26 staying
    // green: capped and effectively-uncapped candidates coincide when
    // occupancy never crosses MaxBandBucket
    val docs = graft.sources.Tables.documents(spark, sf)
    val sigs = Dedup.minHashSignatures(docs)
    val bandsPerBucket = Dedup.bandCandidates(sigs, Int.MaxValue)
    val capped = Dedup.bandCandidates(sigs)
    assert(capped.collect().map(_.toSeq).toSet ===
      bandsPerBucket.collect().map(_.toSeq).toSet)
  }

  // --- semantic dedup: exact-duplicate clique collapse ----------------------

  test("semanticDedup collapses an exact-duplicate clique before the bucket join") {
    // 20k vectors but only 8 distinct values: the worst bucket-clique
    // shape (identical docs → identical embeddings). The exact
    // pre-collapse must hand the LSH join 8 members total — without it
    // one bucket holds 2500+ copies and the join goes quadratic.
    import graft.operators.VectorOps
    val dim = VectorOps.Dim
    val emb = spark.range(0, 20000).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        d => (pmod(col("id"), lit(8L)) + d.cast("long")).cast("float") / 100f)
        .as("embedding"))
    val mapping = VectorOps.exactCollapse(emb)
    assert(mapping.where(col("vec_id") === col("rep0")).count() === 8L)
    val labels = VectorOps.semanticDedup(emb, minCosine = 0.9999)
    assert(labels.count() === 20000L)
    // every vector labels to its value-group's minimum id (groups are
    // id mod 8, and neighboring value-groups also clear the loose
    // threshold only if cosine says so — at minimum the exact groups
    // must be merged onto ids 0..7 or below)
    assert(labels.where(col("rep_id") > col("vec_id")).count() === 0L)
    assert(labels.where(col("kept")).count() <= 8L)
  }

  test("exactCollapse plans no Window — per-row memory when one vector repeats 100k times") {
    // the embedding-space hub: one vector duplicated 10⁵ times (identical
    // docs → identical embeddings). A Window.partitionBy(v) hands ALL
    // copies to one task to buffer; the min-agg + join-back form combines
    // map-side and streams the join, so per-task memory is per-row.
    import graft.operators.VectorOps
    val emb = spark.range(0, 100000).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(16)), d => d.cast("float") / 100f)
        .as("embedding"))
    val mapping = VectorOps.exactCollapse(emb)
    val qe = mapping.queryExecution
    val txt = qe.executedPlan.toString + "\n" + qe.optimizedPlan.toString
    assert(!txt.contains("Window"),
      s"exactCollapse buffers whole value-groups in a window partition:\n$txt")
    assert(mapping.count() === 100000L)
    // every copy maps to the single minimum id
    assert(mapping.where(col("rep0") =!= 0L).count() === 0L)
    assert(mapping.where(col("vec_id") === col("rep0")).count() === 1L)
  }

  // --- injectable reliable checkpoint --------------------------------------

  test("reliable-checkpoint path ≡ localCheckpoint path (clusters + anchors)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (9L, 4L), (7L, 7L), (10L, 11L))
      .toDF("doc_a", "doc_b").withColumn("jaccard", lit(1.0))
    val local = Dedup.duplicateClusters(pairs)
      .collect().map(_.toSeq).toSet
    val reliable = Dedup.duplicateClusters(pairs, checkpointDir = Some(dir))
      .collect().map(_.toSeq).toSet
    assert(reliable === local)
    // the reliable path actually wrote RDD checkpoint data under dir
    val wrote = new java.io.File(dir).listFiles()
    assert(wrote != null && wrote.nonEmpty, "no reliable checkpoint data written")

    val docs = graft.sources.Tables.documents(spark, sf)
    val aLocal = Dedup.anchorFrame(docs).collect().map(_.toSeq).toSet
    val aReliable = Dedup.anchorFrame(docs, checkpointDir = Some(dir))
      .collect().map(_.toSeq).toSet
    assert(aReliable === aLocal)
  }

  // --- as-of join: NULL ts + hot-key straggler bound ------------------------

  test("asOfJoinBucketed ≡ asOfJoin on NULL-ts rows (sentinel bucket)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, null.asInstanceOf[java.sql.Timestamp]),
      (102L, 2L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (200L, 1L, ts("2024-01-01 09:00:00")),
      (201L, 2L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("event_id", "user_id", "ts")
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(Analytics.asOfJoinBucketed(left, right)) ===
      rows(Analytics.asOfJoin(left, right)))
    // NULL-ts left rows are EMITTED (not dropped by the bucket join)
    assert(Analytics.asOfJoinBucketed(left, right).count() === 3L)
  }

  test("bucketed as-of parallelizes a 1M-event hot key (straggler bound)") {
    // one user, 10⁶ events: the bot-key shape where the plain per-user
    // window serializes on one task. The bucketed variant splits the
    // timeline — wall time must not blow past the plain form, and the
    // results must agree exactly (checksum compare; 10⁶ rows don't
    // collect).
    val n = 500000L
    val base = 1700000000000000L // micros
    val left = spark.range(n).select(
      (col("id") + 1000000L).as("event_id"), lit(1L).as("user_id"),
      timestamp_micros(lit(base) + col("id") * 2000000L + 1000000L).as("ts"))
    val right = spark.range(n).select(
      col("id").as("event_id"), lit(1L).as("user_id"),
      timestamp_micros(lit(base) + col("id") * 2000000L).as("ts"))
    def checksum(df: DataFrame) = df.agg(
      count(lit(1)), sum("l_id"), sum("r_id"), sum("lag_micros"),
      sum(when(col("r_id").isNull, 1L).otherwise(0L))).collect()(0).toSeq
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // ~1000 buckets over the 10⁶-second span → ≤ ~1000 rows per
    // (key, bucket) task instead of one 10⁶-row task
    val (bucketed, tBucketed) = timed(
      checksum(Analytics.asOfJoinBucketed(left, right, bucketMicros = 1000000000L)))
    val (plain, tPlain) = timed(checksum(Analytics.asOfJoin(left, right)))
    assert(bucketed === plain)
    // generous bound: the point is the bucketed form must not DEGRADE
    // into something slower than the serial scan it exists to replace
    assert(tBucketed <= tPlain * 2 + 30.0,
      s"bucketed $tBucketed s vs plain $tPlain s — straggler bound not holding")
  }
}
