package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for dataset mixing (builder brief
  * "large-scale training-data pipeline"; SURVEY.md §2.11). Training-data
  * curation needs samples that are REPRODUCIBLE — re-running the
  * pipeline over the same corpus must select the same rows, and two
  * engines must agree — so both operators derive their randomness from
  * a content hash ([[TextOps.hash32]], bit-identical in Spark and the
  * DuckDB oracle), never from `rand()`.
  *
  * Scale shapes: the Bernoulli sample is a pure per-row predicate (a
  * map-only scan that pushes nothing but compute); the stratified quota
  * is one shuffle on the stratum key with a bounded per-stratum window
  * — the standard "cap each language/source at N documents" mixing
  * step.
  */
object Sampling {
  import TextOps.{hash32, hash32Sql}

  /** Hash-space denominator: fractions resolve to an integer threshold
    * so both engines compare the same integers (no float rounding). */
  val Denom = 1000000L

  /** Deterministic Bernoulli sample: keep a row iff
    * `hash32(key) mod Denom < fraction·Denom`. Sampling by content hash
    * (not `rand()`) makes the sample stable across runs, partitionings
    * and engines — the property dataset mixing needs. Map-only. */
  /** The Bernoulli-sample predicate as a reusable Column — the single
    * source for [[hashSample]] and composed pipelines (x25). */
  def hashSamplePredicate(keyCol: String, fraction: Double): org.apache.spark.sql.Column = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    hash32(col(keyCol).cast("string")) % Denom < lit((fraction * Denom).toLong)
  }

  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.where(hashSamplePredicate(keyCol, fraction))

  def hashSampleWhereSql(keyExpr: String, fraction: Double): String =
    s"${hash32Sql(s"CAST($keyExpr AS VARCHAR)")} % $Denom < ${(fraction * Denom).toLong}"

  /** Per-stratum quota: the `quota` rows of each stratum with the
    * smallest content hash (hash order = a reproducible shuffle;
    * unique key string as tiebreak). One shuffle on the stratum key;
    * each stratum ranks independently — the "at most N documents per
    * language/source" step of corpus mixing. */
  def stratifiedQuota(df: DataFrame, strataCol: String, keyCol: String,
      quota: Int): DataFrame = {
    val key = col(keyCol).cast("string")
    val w = Window.partitionBy(strataCol).orderBy(hash32(key), key)
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= quota)
      .drop("_rk")
  }

  def stratifiedQuotaQualifySql(strataCol: String, keyExpr: String, quota: Int): String =
    s"QUALIFY row_number() OVER (PARTITION BY $strataCol ORDER BY " +
      s"${hash32Sql(s"CAST($keyExpr AS VARCHAR)")}, CAST($keyExpr AS VARCHAR)) <= $quota"

  /** Weighted mixture sampling — the "dataset mixing" step a training
    * snapshot actually runs: given target proportions per stratum and a
    * total document budget, sample stratum s at rate
    * `min(1, budget·w_s / n_s)` so the output approaches the target mix
    * regardless of how skewed the raw corpus is. The per-stratum rate
    * DERIVES FROM DATA (one tiny counts aggregate, broadcast back), the
    * keep-decision is the same content-hash integer threshold as
    * [[hashSample]] — deterministic across runs, partitionings, and
    * engines; thresholds are computed in identical double math and
    * floored, so both engines compare the same integers. Shape: one
    * |strata|-row aggregate + a broadcast join + a map-only predicate. */
  def mixtureSample(df: DataFrame, strataCol: String, keyCol: String,
      weights: Seq[(String, Double)], budget: Long): DataFrame = {
    require(weights.forall(_._2 >= 0), "negative mixture weight")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("_n"))
    val w = weights.foldRight(lit(0.0)) { case ((s, wt), acc) =>
      when(col(strataCol) === s, lit(wt)).otherwise(acc)
    }
    val thresh = least(lit(Denom),
      floor(lit(budget.toDouble) * w * lit(Denom) / col("_n")))
    df.join(broadcast(counts), strataCol)
      .where(hash32(col(keyCol).cast("string")) % Denom < thresh)
      .drop("_n")
  }

  def mixtureSampleSql(strataCol: String, keyExpr: String,
      weights: Seq[(String, Double)], budget: Long): String = {
    val cases = weights.map { case (s, wt) => s"WHEN '$s' THEN $wt" }
      .mkString("CASE d.x_strata ", " ", " ELSE 0.0 END")
    s"""WITH c AS (
       |  SELECT $strataCol AS x_strata, count(*) AS n FROM documents GROUP BY $strataCol
       |), d AS (
       |  SELECT *, $strataCol AS x_strata FROM documents
       |)
       |SELECT doc_id, lang, source FROM d JOIN c USING (x_strata)
       |WHERE ${hash32Sql(s"CAST($keyExpr AS VARCHAR)")} % $Denom <
       |  least($Denom, floor($budget.0 * ($cases) * $Denom / n))""".stripMargin
  }

  /** Per-stratum length-decile banding: each document's length band
    * WITHIN its language/source (ntile, ties broken by key for
    * determinism) — the upstream of length-balanced sampling and of
    * "drop the shortest decile per language" curation rules. One window
    * per stratum parallelizes across strata (same scale shape as
    * [[packByBudget]]) — but a stratum IS one sort partition, and real
    * corpora have a dominant stratum (90% English is the normal case),
    * so at 100 TB that stratum rides on a single straggler task. This
    * exact form is the oracle-checked spec; for the scale path use
    * [[lengthDecilesApprox]], which replaces the rank window with
    * broadcast `percentile_approx` cut points and a map-only
    * assignment. */
  def lengthDeciles(df: DataFrame, strataCol: String, lenCol: String,
      keyCol: String): DataFrame =
    df.withColumn("decile",
      ntile(10).over(Window.partitionBy(strataCol)
        .orderBy(col(lenCol), col(keyCol))))

  /** [[lengthDeciles]]' 100 TB shape — the same device as
    * [[TextOps.surprisalBandsApprox]]: per-stratum decile CUTOFFS via
    * one `percentile_approx` aggregate (map-side-combined, no
    * per-stratum sort partition, no dominant-stratum straggler), then
    * band assignment as a map-only comparison against the broadcast
    * cutoff row. Deciles are approximate at the boundaries
    * (quantile-sketch error, plus ties land whole tie-groups on one
    * side where ntile splits them by key) but each doc's decile is
    * within one of the exact cut for any reasonable accuracy —
    * spec-pinned against [[lengthDeciles]] on the fixture. Not
    * oracle-registered: the sketch is Spark-internal, so there is no
    * engine-independent declarative twin; the exact ntile form above
    * remains the oracle query. */
  def lengthDecilesApprox(df: DataFrame, strataCol: String, lenCol: String,
      accuracy: Int = 10000): DataFrame = {
    val cuts = df.groupBy(strataCol).agg(
      percentile_approx(col(lenCol).cast("double"),
        array((1 until 10).map(i => lit(i / 10.0)): _*),
        lit(accuracy)).as("cuts"))
    df.join(broadcast(cuts), strataCol)
      .withColumn("decile",
        aggregate(col("cuts"), lit(1L), (acc, c) =>
          acc + when(col(lenCol).cast("double") > c, lit(1L)).otherwise(lit(0L))))
      .drop("cuts")
  }

  def lengthDecilesSelectSql(strataCol: String, lenCol: String,
      keyCol: String): String =
    s"ntile(10) OVER (PARTITION BY $strataCol ORDER BY $lenCol, $keyCol) AS decile"

  /** Sequence packing (training-batch construction): assign each
    * document to a fixed token-budget pack, first-fit-in-key-order
    * WITHIN its stratum — a document joins the pack its exclusive
    * cumulative token count falls in, so every pack except a stratum's
    * last holds ≥ `budget` tokens' worth of starts. Packing per stratum
    * (language/source) is the scale shape: one window per stratum
    * parallelizes across strata, where a single global sequential pack
    * would serialize the corpus on one partition. */
  def packByBudget(df: DataFrame, strataCol: String, keyCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(strataCol).orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumExclusive = sum(col(tokensCol)).over(w) - col(tokensCol)
    df.withColumn("pack_id", floor(cumExclusive / lit(budget.toDouble)).cast("long"))
  }

  def packByBudgetSelectSql(strataCol: String, keyCol: String,
      tokensExpr: String, budget: Long): String =
    s"CAST(floor((sum($tokensExpr) OVER (PARTITION BY $strataCol ORDER BY $keyCol " +
      s"ROWS UNBOUNDED PRECEDING) - $tokensExpr) / $budget.0) AS BIGINT) AS pack_id"

  /** [[packByBudget]]' 100 TB shape. First-fit-in-order is sequential by
    * definition, and a window `partitionBy(stratum)` hands a dominant
    * stratum (90% English is the normal case) to ONE task sorting the
    * whole stratum. The two-level form breaks the chain: hash each
    * stratum into `ceil(Σtokens / budget / targetPacksPerBucket)`
    * sub-buckets (so a sub-bucket holds ~`targetPacksPerBucket` packs
    * regardless of stratum size), first-fit WITHIN the sub-bucket — the
    * per-task sort is now bounded by the sub-bucket, parallel across
    * sub-buckets — then make pack ids globally dense per stratum by
    * offsetting each sub-bucket's local ids with a broadcast exclusive
    * prefix-sum of per-sub-bucket pack counts. The pack count needs NO
    * second pass over the data: within a sub-bucket the exclusive
    * cumulative sum is maximal at the last row in key order, so
    * `n_packs = floor((Σtokens − tokens_last) / budget) + 1` falls out
    * of one map-side-combined aggregate (`max_by` picks the last row's
    * tokens; keys are unique by [[packByBudget]]'s contract).
    *
    * Semantics trade: first-fit order is preserved within each
    * sub-bucket, not across the stratum — packs differ from the exact
    * form's (which remains the oracle query), but every pack except at
    * most one per sub-bucket still holds ≥ `budget` tokens' worth of
    * starts, which is the property training-batch construction needs.
    * With a single sub-bucket the output IS the exact form
    * (spec-pinned). Not oracle-registered: sub-bucket assignment is
    * engine-local layout, the exact form stays the declarative spec. */
  def packByBudgetTwoLevel(df: DataFrame, strataCol: String, keyCol: String,
      tokensCol: String, budget: Long,
      targetPacksPerBucket: Int = 64): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(targetPacksPerBucket > 0,
      s"targetPacksPerBucket must be positive: $targetPacksPerBucket")
    val nb = df.groupBy(strataCol).agg(
      greatest(lit(1L), ceil(sum(col(tokensCol)).cast("double") /
        lit(budget.toDouble * targetPacksPerBucket)).cast("long")).as("_nb"))
    val withB = df.join(broadcast(nb), strataCol)
      .withColumn("_sb", pmod(hash32(col(keyCol).cast("string")), col("_nb")))
      .drop("_nb")
    val w = Window.partitionBy(col(strataCol), col("_sb")).orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withB.withColumn("_lp",
      floor((sum(col(tokensCol)).over(w) - col(tokensCol)) /
        lit(budget.toDouble)).cast("long"))
    // per-sub-bucket pack counts from ONE aggregate (no window re-pass),
    // then exclusive prefix offsets — a window over the |strata|·nb-row
    // counts frame, broadcast back
    val counts = withB.groupBy(col(strataCol), col("_sb")).agg(
      (floor((sum(col(tokensCol)) - max_by(col(tokensCol), col(keyCol))) /
        lit(budget.toDouble)).cast("long") + 1L).as("_np"))
    val offsets = counts.withColumn("_off",
      coalesce(sum(col("_np")).over(
        Window.partitionBy(strataCol).orderBy("_sb")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(strataCol), col("_sb"), col("_off"))
    local.join(broadcast(offsets), Seq(strataCol, "_sb"))
      .withColumn("pack_id", col("_off") + col("_lp"))
      .drop("_sb", "_lp", "_off")
  }

  /** Weighted sample without replacement (Efraimidis & Spirakis, IPL
    * 2006, algorithm A-ES): each row gets priority u^(1/w) for uniform
    * u and weight w, and the n largest priorities ARE a weighted sample
    * without replacement — the standard way to tilt a corpus sample
    * toward long/high-quality documents in one distributed pass. The
    * uniform is the content hash (never `rand()`, per this object's
    * contract), the priority is compared as ln(u)/w — the same order,
    * no underflow for large weights — rounded onto a 10⁻¹² grid so both
    * engines rank identical values (the x38 device, applied to
    * ordering; kept as DOUBLE — both engines' parquet/pandas types
    * align, and the 12-dp round IS the quantization). Selection is
    * sort+limit, which Spark plans as a distributed top-k
    * (TakeOrderedAndProject) — per-partition heaps, no global shuffle —
    * but ONLY while `n <= spark.sql.execution.topKSortFallbackThreshold`
    * (default 10000); a larger `n` silently falls back to a global
    * range-partitioned sort, so large-budget callers must raise that
    * config to keep the distributed-top-k shape. Only
    * zero/negative/NULL weights are clamped to 1 (fractional weights
    * tilt as given).
    *
    * Returns the selected rows with their priority (`pri`); the input
    * must not already carry a `pri` column (it would be silently
    * overwritten otherwise — same contract as `_rk` in
    * [[stratifiedQuota]]). */
  def weightedSample(df: DataFrame, weightCol: String, keyCol: String,
      n: Int): DataFrame = {
    require(!df.columns.contains("pri"),
      "weightedSample emits a 'pri' column; input already has one")
    val u = (hash32(col(keyCol).cast("string")) % Denom + 1).cast("double") /
      lit((Denom + 1).toDouble)
    // only non-positive/NULL weights are clamped — fractional weights in
    // (0, 1) are legitimate A-ES inputs (quality scores) and must tilt,
    // not collapse to uniform
    val wc = col(weightCol).cast("double")
    val w = when(wc.isNull || wc <= 0.0, lit(1.0)).otherwise(wc)
    val pri = round(log(u) / w, 12)
    df.withColumn("pri", pri)
      .orderBy(col("pri").desc, col(keyCol).cast("string"))
      .limit(n)
  }

  /** [[weightedSample]] oracle skeleton: the priority expression + the
    * ORDER BY ... LIMIT tail (compose around a SELECT over the fixture). */
  def weightedSamplePriSql(weightExpr: String, keyExpr: String): String =
    s"round(ln((${hash32Sql(s"CAST($keyExpr AS VARCHAR)")} % $Denom + 1) " +
      s"/ ${Denom + 1}.0) / (CASE WHEN CAST($weightExpr AS DOUBLE) > 0 " +
      s"THEN CAST($weightExpr AS DOUBLE) ELSE 1.0 END), 12) AS pri"

  /** Greedy token-budget corpus selection: walk the corpus in quality
    * order (`uniq_ratio` DESC, `doc_id` as the deterministic tiebreak)
    * and keep the longest prefix whose cumulative token count stays
    * within `budget` — the "best N billion tokens" curation step that
    * sits between quality scoring and training-shard construction.
    * Prefix semantics (stop at the first overflowing document), so the
    * result is exactly the declarative window form
    * `sum(n_tokens) OVER (ORDER BY uniq_ratio DESC, doc_id) <= budget`
    * — which is the oracle query, but NOT the execution plan: a global
    * ordered cumulative sum is one sort partition, the very shape this
    * file keeps evicting.
    *
    * The scale shape instead resolves the budget in quality-histogram
    * space: (1) bucket each doc's quality onto a `res`-cell grid
    * (map-only; floor is monotonic, so bucket order refines quality
    * order); (2) one map-side-combined aggregate sums tokens per
    * bucket — ≤ `res`+1 rows, collected as bounded driver metadata
    * (the k×dim k-means grid precedent); (3) a driver scan finds the
    * boundary bucket where the budget runs out; (4) every doc in a
    * strictly better bucket is kept by a map-only filter, and ONLY the
    * boundary bucket — expected corpus/`res` rows — pays an exact
    * in-bucket prefix window for the remaining budget. Degenerate
    * bound, stated honestly: a corpus whose quality is one constant
    * lands entirely in the boundary bucket and the window serializes —
    * ties cannot be split by a finer grid. Real quality scores are
    * ratio-valued and spread; `res` = 4096 puts ~0.02% of the corpus
    * in the windowed bucket.
    *
    * Returns (doc_id, n_tokens, uniq_ratio) for the selected prefix.
    * NULL-text documents carry NULL quality and are excluded outright
    * (both sides — a NULL would otherwise land in a NULL histogram
    * bucket here and sort engine-dependently in the oracle's window).
    * Runs the histogram job at call time (the x26 convention: the
    * operator IS iterative/driver-resolved, a deliberate exception to
    * lazy build). */
  def selectByTokenBudget(docs: DataFrame, budget: Long,
      res: Int = 4096): DataFrame =
    selectScoredByBudget(
      TextOps.qualityScore(docs)
        .select(col("doc_id"), col("n_tokens"), col("uniq_ratio"))
        .where(col("n_tokens").isNotNull && col("uniq_ratio").isNotNull),
      budget, res)

  /** [[selectByTokenBudget]]'s core over an already-scored frame
    * `(doc_id, n_tokens, uniq_ratio)` — callers with their own quality
    * metric plug in here (and the ScalaCheck property drives this
    * directly with adversarial tie/boundary corpora the fixture can't
    * produce). `uniq_ratio` must be non-null and in [0, 1]. */
  def selectScoredByBudget(scored: DataFrame, budget: Long,
      res: Int = 4096): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    require(res > 0, s"res must be positive: $res")
    require(!scored.columns.contains("_qb") && !scored.columns.contains("_cum"),
      "selectScoredByBudget uses internal columns '_qb'/'_cum'; " +
        "input must not carry them (the 'pri' contract of weightedSample)")
    val withB = scored.withColumn("_qb",
      least(floor(col("uniq_ratio") * res), lit(res.toLong)).cast("int"))
    // ≤ res+1 rows of (bucket, token-sum): bounded metadata, one
    // map-side-combined aggregate over the corpus
    val hist = withB.groupBy("_qb").agg(sum("n_tokens").as("_t")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(-_._1)
    // walk buckets best-first until the budget runs out
    var before = 0L
    var boundary = Option.empty[Int]
    val it = hist.iterator
    while (boundary.isEmpty && it.hasNext) {
      val (qb, t) = it.next()
      if (before + t > budget) boundary = Some(qb) else before += t
    }
    boundary match {
      case None => scored // the whole corpus fits
      case Some(qb) =>
        val keepAll = withB.filter(col("_qb") > qb)
        val w = Window.partitionBy("_qb")
          .orderBy(col("uniq_ratio").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val fromBoundary = withB.filter(col("_qb") === qb)
          .withColumn("_cum", sum("n_tokens").over(w))
          .where(col("_cum") <= budget - before)
          .drop("_cum")
        keepAll.union(fromBoundary).drop("_qb")
    }
  }

  /** Deterministic training-shard assignment: `shard =
    * hash32(key) mod nShards` — the write-layout step after
    * [[packByBudget]] builds batches: N shard files a data loader can
    * stream round-robin, every engine/rerun agreeing on placement
    * (content hash, never `rand()` or partition index, per this
    * object's contract). Map-only; the hash equidistributes doc counts
    * AND token mass across shards regardless of input order or skew in
    * any natural key. */
  def assignShards(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    require(!df.columns.contains("shard"),
      "assignShards emits a 'shard' column; input already has one")
    df.withColumn("shard",
      pmod(hash32(col(keyCol).cast("string")), lit(nShards.toLong)))
  }

  /** Per-shard balance report over [[assignShards]]: doc and token
    * counts per shard — the skew check run before committing a shard
    * layout (a loader is throttled by its heaviest shard). One
    * map-side-combined aggregate to ≤ `nShards` rows. */
  def shardStats(df: DataFrame, keyCol: String, tokensCol: String,
      nShards: Int): DataFrame =
    assignShards(df, keyCol, nShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).cast("long").as("n_tokens"))

  /** [[shardStats]] oracle skeleton over a FROM-able doc relation
    * exposing the key and a token-count expression. `from` swaps the
    * source relation (the docsSql convention), so token-count variants
    * (x82's BPE units) compose through here instead of re-implementing
    * the shard-assignment arithmetic. */
  def shardStatsSql(keyExpr: String, tokensExpr: String,
      nShards: Int, from: String = "documents"): String =
    s"""SELECT ${hash32Sql(s"CAST($keyExpr AS VARCHAR)")} % $nShards AS shard,
       |  count(*) AS n_docs,
       |  CAST(sum($tokensExpr) AS BIGINT) AS n_tokens
       |FROM $from GROUP BY 1""".stripMargin

  /** [[selectByTokenBudget]]'s declarative twin — the global prefix
    * window the operator's histogram plan is proven equal to. */
  def selectByTokenBudgetSql(budget: Long): String =
    s"""WITH scored AS (${TextOps.qualityScoreSql}),
       |sel AS (
       |  SELECT doc_id, n_tokens, uniq_ratio,
       |    sum(n_tokens) OVER (ORDER BY uniq_ratio DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM scored
       |  WHERE n_tokens IS NOT NULL AND uniq_ratio IS NOT NULL)
       |SELECT doc_id, n_tokens, uniq_ratio FROM sel WHERE cum <= $budget""".stripMargin
}
