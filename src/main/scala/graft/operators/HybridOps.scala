package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of the engine's two
  * ranked-search halves — lexical [[TextOps.bm25TopK]] and dense
  * [[VectorOps.annTopK]] — into one ranked list per query, the way
  * production retrieval actually serves (Cormack/Clarke/Büttcher,
  * SIGIR'09: RRF outperforms either list alone and needs no score
  * calibration across scoring scales).
  *
  * The reference feeds documents INTO a search service and leaves
  * ranking to it (reference: flows/main_flow.py:528-563 bulk-indexes
  * and never reads back); serving the fused lookup itself is the part a
  * Spark-native engine must add for parity with what users ultimately
  * query.
  *
  * Determinism is free here because the fusion is INTEGER arithmetic:
  * `RRF(d) = Σ_lists 1/(K + rank_d)` is evaluated as
  * `Σ D/(K + rank_d)` with `D = lcm(K+1 … K+k)` — every divisor is
  * exact, so no floating-point sum order can move a rank. Ties break on
  * doc_id. A document absent from one list contributes 0 from that
  * list (the standard RRF convention).
  *
  * Scale shape: both inputs are already top-k frames — ≤ k·|queries|
  * rows each — so the fusion itself (one full-outer join on
  * (query_id, doc_id) + one window over ≤ 2k rows per query) is noise
  * next to the retrievals that produce them; the heavy lifting keeps
  * the bm25/ANN scale shapes documented on their own operators. The two
  * halves share one id space: `embeddings.vec_id` keys the same corpus
  * rows as `documents.doc_id` (the usual hybrid layout — a doc's
  * embedding is stored under its doc id).
  */
object HybridOps {

  /** The RRF smoothing constant — 60, the value of the original paper
    * and of every mainstream implementation. Interpolated into both the
    * Spark plan and the oracle SQL (the x51 single-constant rule). */
  val RrfK = 60

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** `lcm(K+1 … K+k)` — the common denominator that turns the RRF sum
    * into exact integer arithmetic. For K=60, k=5: lcm(61…65), well
    * inside Long. */
  def rrfDenom(k: Int, kRrf: Int = RrfK): Long =
    (1 to k).map(r => (kRrf + r).toLong).reduce((a, b) => a / gcd(a, b) * b)

  /** Fuse two ranked lists `(query_id, doc_id, rn)` by RRF; emit the
    * per-query top-k of the fused ranking as
    * `(query_id, doc_id, rrf, rn)` with `rrf` the exact integer
    * `Σ D/(K+rank)`. Public seam so callers can fuse any two ranked
    * frames (e.g. a filtered ANN variant against BM25). */
  def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int): DataFrame = {
    val d = rrfDenom(k)
    val l = lex.select(col("query_id"), col("doc_id"), col("rn").as("lex_rn"))
    val r = dense.select(col("query_id"), col("doc_id"), col("rn").as("dense_rn"))
    val fused = l.join(r, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(d) / (lit(RrfK) + col("lex_rn")), lit(0L)).cast("long") +
          coalesce(lit(d) / (lit(RrfK) + col("dense_rn")), lit(0L)).cast("long"))
          .as("rrf"))
    val w = Window.partitionBy("query_id").orderBy(desc("rrf"), asc("doc_id"))
    fused.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** End-to-end hybrid top-k: BM25 over `docs` for the lexical term
    * batch, LSH-bucketed ANN over `embeddings` for the same query ids
    * (each query id doubles as its query vector's vec_id), RRF-fused.
    * Each half retrieves its own top-k before fusion — the standard
    * two-stage serve. */
  def hybridTopK(docs: DataFrame, embeddings: DataFrame,
      queries: Seq[(Long, Seq[String])], k: Int,
      numPlanes: Int = VectorOps.NumPlanes,
      checkpointDir: Option[String] = None): DataFrame = {
    val (tf, dl) = TextOps.bm25Stats(docs, checkpointDir)
    hybridTopKFrom(tf, dl, embeddings, queries, k, numPlanes)
  }

  /** [[hybridTopK]] from prebuilt lexical index frames — the serve path
    * when the index is maintained incrementally
    * ([[graft.streaming.StreamingLexical]]'s artifact plus an appended
    * embedding frame): hybrid search over a streaming corpus without
    * re-tokenizing anything, through the exact batch scoring/fusion
    * code. */
  def hybridTopKFrom(tf: DataFrame, dl: DataFrame, embeddings: DataFrame,
      queries: Seq[(Long, Seq[String])], k: Int,
      numPlanes: Int = VectorOps.NumPlanes): DataFrame = {
    val lex = TextOps.bm25TopKFrom(tf, dl, queries, k)
    val dense = VectorOps.annTopK(embeddings, queries.map(_._1), k, numPlanes)
      .withColumnRenamed("vec_id", "doc_id")
    rrfFuse(lex, dense, k)
  }

  /** [[hybridTopK]] oracle — composes the two halves' own oracle CTEs
    * (verbatim, as derived subqueries) and fuses with the same integer
    * arithmetic (`//` is DuckDB's integer division). */
  def hybridTopKSql(queries: Seq[(Long, Seq[String])], k: Int): String = {
    val d = rrfDenom(k)
    s"""WITH lex AS (
       |  SELECT query_id, doc_id, rn FROM (${TextOps.bm25TopKSql(queries, k)})
       |), dense AS (
       |  SELECT query_id, vec_id AS doc_id, rn
       |  FROM (${VectorOps.annTopKSql(queries.map(_._1), k)})
       |), fused AS (
       |  SELECT coalesce(l.query_id, r.query_id) AS query_id,
       |    coalesce(l.doc_id, r.doc_id) AS doc_id,
       |    coalesce($d // ($RrfK + l.rn), 0) +
       |      coalesce($d // ($RrfK + r.rn), 0) AS rrf
       |  FROM lex l FULL OUTER JOIN dense r
       |    ON l.query_id = r.query_id AND l.doc_id = r.doc_id
       |)
       |SELECT query_id, doc_id, rrf,
       |  row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf DESC, doc_id) AS rn
       |FROM fused
       |QUALIFY rn <= $k""".stripMargin
  }
}
