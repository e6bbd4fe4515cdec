package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Product-quantization properties that the oracle hash can't see:
  * partition-independence of the one-pass multi-subspace trainer,
  * encode/reconstruct consistency, and the ADC path against a
  * driver-side reference. */
class PqSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb = graft.sources.Tables.embeddings(spark, sf).cache()
  private lazy val books = VectorOps.pqTrainedCodebooks(emb)

  test("codebooks: m books of ksub sub-centroids of Dim/m dims, partition-independent") {
    assert(books.size === VectorOps.PqSubspaces)
    assert(books.forall(_.size === VectorOps.PqSubCentroids))
    val d = VectorOps.Dim / VectorOps.PqSubspaces
    assert(books.forall(_.forall(_.size === d)))
    // grid-summed training must not depend on how the corpus is split
    val books7 = VectorOps.pqTrainedCodebooks(emb.repartition(7))
    assert(books7 === books, "training diverged under a different partitioning")
  }

  test("codes: one id per (vector, subspace), in range, partition-independent") {
    val codes = VectorOps.pqCodes(emb, Some(books)).cache()
    val n = emb.count()
    assert(codes.count() === n * VectorOps.PqSubspaces)
    val bad = codes.where(col("code") < 0 ||
      col("code") >= VectorOps.PqSubCentroids).count()
    assert(bad === 0L, "code outside [0, ksub)")
    val again = VectorOps.pqCodes(emb.repartition(5), Some(books))
    assert(codes.exceptAll(again).count() === 0L &&
      again.exceptAll(codes).count() === 0L,
      "encoding diverged under a different partitioning")
  }

  test("a vector equal to a sub-centroid concat encodes to it and reconstructs exactly") {
    val sess = spark
    import sess.implicits._
    // synthetic vector: subspace m takes book(m)(m)'s centroid verbatim
    val v = (0 until VectorOps.PqSubspaces).flatMap(mi => books(mi)(mi))
      .map(_.toFloat)
    val synth = Seq((100000L, v)).toDF("vec_id", "embedding")
    val got = VectorOps.pqCodes(synth, Some(books))
      .orderBy("sub").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq === (0 until VectorOps.PqSubspaces).map(mi => (mi, mi.toLong)),
      "nearest sub-centroid to a centroid must be itself")
  }

  test("ADC top-k matches a driver-side reconstruct-and-rank reference") {
    val queryIds = Seq(0L, 1L, 2L)
    val k = 5
    val vecs = emb.select(col("vec_id"),
        VectorOps.asDoubles(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val d = VectorOps.Dim / VectorOps.PqSubspaces
    def code(v: Seq[Double], mi: Int): Int =
      books(mi).zipWithIndex.minBy { case (cv, ci) =>
        (cv.zip(v.slice(mi * d, (mi + 1) * d))
          .map { case (c, x) => (x - c) * (x - c) }.sum, ci)
      }._2
    def recon(v: Seq[Double]): Seq[Double] =
      (0 until VectorOps.PqSubspaces).flatMap(mi => books(mi)(code(v, mi)))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    val want = queryIds.flatMap { q =>
      val qv = vecs(q)
      vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          (q, id, BigDecimal(cos(qv, recon(v)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .filterNot(t => t._3.isNaN)
        .sortBy(t => (-t._3, t._2)).take(k).zipWithIndex
        .map { case ((qq, id, c), i) => (qq, id, c, i + 1) }
    }.toSet
    val got = VectorOps.pqTopK(emb, queryIds, k, Some(books))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got === want)
  }

  test("PQ beats nothing it shouldn't: reconstructed self-cosine is high on real vectors") {
    // the compression sanity floor: a 64-dim vector reconstructed from
    // 8 sub-centroids should still point mostly the same way — mean
    // cosine(v, recon(v)) well above 0 (a random codebook gives ~0)
    val recon = VectorOps.pqTopK(emb, Seq(0L), 1, Some(books)) // force build path
    assert(recon.count() >= 0)
    val codes = VectorOps.pqCodesWide(emb, books)
    val meanSelf = codes
      .select(graft.functions.VectorFunctions
        .cosineSimilarity(col("v"), VectorOps.reconOf(col("codes"), books)).as("c"))
      .where(!isnan(col("c")))
      .agg(avg("c")).collect()(0).getDouble(0)
    assert(meanSelf > 0.3,
      f"mean self-reconstruction cosine $meanSelf%.3f — codebook not learning")
  }
}
