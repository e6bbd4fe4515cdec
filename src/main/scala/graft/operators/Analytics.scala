package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic-surface operators (SURVEY.md §2.5-§2.7, §2.11): window
  * functions, grouping sets, set operations, distinct estimation, time
  * bucketing. The reference contains none of these (its only analytics are
  * count-group-by + sort), but "same capabilities" is a floor — these are
  * the Spark builtins the engine exposes, wired to fixtures and oracles.
  *
  * Scale notes: window functions shuffle once on the partition key;
  * rollup/cube expand via `Expand` (no extra shuffle rounds); set ops are
  * hash-partitioned distinct unions. All stay in whole-stage codegen.
  */
object Analytics {

  /** Money-safe decimal cast: fixture doubles carry 2-decimal values;
    * decimal arithmetic makes sums exact and order-independent — the only
    * way a distributed sum can hash-match a single-threaded oracle.
    * Final outputs are cast back to double (`asDouble`) because decimal
    * columns surface with path-dependent representations downstream
    * (pyarrow Decimal vs DuckDB float) while an exact value → double
    * conversion is identical everywhere. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact-decimal aggregate → stable double output. */
  def asDouble(c: Column): Column = c.cast("double")

  /** Ranking + running aggregate over an ordered per-key frame
    * (row_number / rank / running sum). One shuffle on `partCol`.
    * `ordCols` must be a unique key within each partition, or the running
    * sum is non-deterministic across runs/engines. */
  def rankedRunning(df: DataFrame, partCol: String, ordCols: Seq[String], valCol: String): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(ordCols.map(col): _*)
    df.select(
      (col(partCol) +: ordCols.map(col)) ++ Seq(
      row_number().over(w).as("rn"),
      rank().over(w).as("rnk"),
      asDouble(sum(dec(col(valCol)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .as("running_val")): _*)
  }

  /** Lag/lead deltas along event time per key — CDC-adjacent analytics. */
  def deltas(df: DataFrame, partCol: String, ordCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(ordCol)
    df.select(
      col(partCol), col(ordCol),
      col(valCol).as("val"),
      asDouble(dec(col(valCol)) - lag(dec(col(valCol)), 1).over(w)).as("delta"),
      lead(col(ordCol), 1).over(w).as("next_ord"))
  }

  /** ROLLUP aggregate with sentinel-coalesced grouping columns (so the
    * oracle can ORDER BY them NULL-free). */
  def rollupCounts(df: DataFrame, g1: String, g2: String, valCol: String): DataFrame =
    df.rollup(g1, g2)
      .agg(count(lit(1)).as("n"), asDouble(sum(dec(col(valCol)))).as("sum_val"))
      .select(
        coalesce(col(g1), lit("ALL")).as(g1),
        coalesce(col(g2), lit("ALL")).as(g2),
        col("n"), col("sum_val"))

  /** Explicit GROUPING SETS — the general form rollup/cube specialize:
    * caller picks exactly which grouping combinations materialize (one
    * `Expand` + one shuffle for all sets, same as rollup). */
  def groupingSetCounts(df: DataFrame, g1: String, g2: String): DataFrame =
    df.groupingSets(
        Seq(Seq(col(g1), col(g2)), Seq(col(g1)), Seq.empty),
        col(g1), col(g2))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col(g1), lit("ALL")).as(g1),
        coalesce(col(g2), lit("ALL")).as(g2),
        col("n"))

  /** CUBE variant of the same. */
  def cubeCounts(df: DataFrame, g1: String, g2: String): DataFrame =
    df.cube(g1, g2)
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col(g1), lit("ALL")).as(g1),
        coalesce(col(g2), lit("ALL")).as(g2),
        col("n"))

  /** Tumbling time-bucket aggregate (batch form of the streaming windowed
    * count): truncate to the bucket, hash-aggregate. At scale this is the
    * partition-friendly form — bucket key is derivable from the partition
    * column, so with date-partitioned input no extra shuffle is needed. */
  def tumblingCounts(df: DataFrame, tsCol: String, unit: String, keyCol: String): DataFrame =
    df.groupBy(
        date_format(date_trunc(unit, col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Sliding time windows (`window(ts, len, slide)`): each event lands in
    * len/slide overlapping buckets. The expansion happens per-row inside
    * the scan stage (Expand), then one hash aggregate — same shuffle
    * budget as a tumbling window, ×(len/slide) rows into the agg. */
  def slidingCounts(df: DataFrame, tsCol: String, len: String, slide: String,
      keyCol: String): DataFrame =
    df.groupBy(window(col(tsCol), len, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col(keyCol), col("n"))

  /** Session windows (`session_window(ts, gap)`): per-key activity
    * sessions closed after `gap` of silence; end = last event + gap.
    * Spark's session agg merges adjacent windows in one pass — the
    * shuffle is on the session key only, never a global sort. */
  def sessionCounts(df: DataFrame, tsCol: String, gap: String, keyCol: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n"))

  /** Interval (time-bounded) join: each left event matched to the right
    * events of the same key occurring within `within` AFTER it —
    * funnel/attribution analytics (click→purchase). An equi-join on the
    * key with a range predicate: hash join + filter, no theta join, so
    * it scales like any keyed join. Output carries ids + the lag in
    * microseconds (never raw timestamps — oracle determinism rule).
    *
    * Stream-agnostic: pass two WATERMARKED streams and this is Spark's
    * stream-stream interval join — the event-time range condition is
    * exactly the shape the state-cleanup analysis needs, matches emit
    * eagerly (inner join), and state is bounded by `within` + lateness.
    * [[graft.streaming.StreamingEnrich.intervalJoin]] wraps that. */
  def intervalJoin(left: DataFrame, right: DataFrame, within: String): DataFrame =
    left.select(col("user_id"), col("event_id").as("l_id"), col("ts").as("l_ts"))
      .join(
        right.select(col("user_id").as("r_user"), col("event_id").as("r_id"),
          col("ts").as("r_ts")),
        col("user_id") === col("r_user") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("l_id"), col("r_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("lag_micros"))

  /** As-of join: for each left event, the LATEST right event of the same
    * user at-or-before its timestamp (trade-vs-quote / attribution
    * lookup; the operator Spark has no builtin for). Composed as
    * union-tag → one window per user carrying the last-seen right row —
    * ONE shuffle on the key and a linear per-partition sort, vs the
    * equi-join + `max_by` form whose intermediate explodes with
    * |left per key| × |right per key|. Ties are deterministic: at equal
    * ts the right side sorts first (at-or-before includes equality) and
    * equal-ts right rows resolve to the highest event_id — mirrored in
    * the oracle's `ORDER BY r.ts DESC, r.event_id DESC LIMIT 1`.
    * Output: (user_id, l_id, r_id, lag_micros), r_id/lag NULL when no
    * prior right event exists.
    *
    * HOT-KEY BOUND: the per-user window serializes WITHIN a key — one
    * task scans a key's whole timeline, so wall time is O(max events
    * per key) however many executors exist. Fine for human-scale keys
    * (≤ a few million events: one task's linear scan); a pathological
    * key (a bot user with 10⁹ events at 100 TB) makes that task the
    * straggler — use [[asOfJoinBucketed]] there, which splits each
    * key's timeline into time buckets at the cost of one extra
    * (tiny) boundary pass. */
  def asOfJoin(left: DataFrame, right: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val r = right.select(col("user_id"), col("ts"), lit(0).as("side"),
      lit(null).cast("long").as("l_id"),
      col("event_id").as("r_id0"), col("ts").as("r_ts0"))
    val l = left.select(col("user_id"), col("ts"), lit(1).as("side"),
      col("event_id").as("l_id"),
      lit(null).cast("long").as("r_id0"), lit(null).cast("timestamp").as("r_ts0"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("r_id0"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("r_id", last(col("r_id0"), ignoreNulls = true).over(w))
      .withColumn("r_ts", last(col("r_ts0"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("user_id"), col("l_id"), col("r_id"),
        (unix_micros(col("ts")) - unix_micros(col("r_ts"))).as("lag_micros"))
  }

  /** [[asOfJoin]] for skewed keys: identical semantics, but each key's
    * timeline is SPLIT into time buckets so no task ever scans more
    * than one (key, bucket) slice — the straggler bound drops from
    * O(events per key) to O(events per key per bucket), and a hot key
    * parallelizes across its buckets. The classic two-level scan:
    *
    *  1. within-bucket pass — the same union-tag running-`last` window,
    *     partitioned by (user, bucket) instead of user;
    *  2. boundary pass — per (user, bucket), the LAST right event
    *     (lexicographic max of (ts, id) — same tie-break), then a
    *     carry-forward window over this per-bucket summary ordered by
    *     bucket. The summary has one row per (user, active bucket) —
    *     the per-user sequential part shrinks from the full timeline
    *     to #buckets rows;
    *  3. stitch — left rows with no within-bucket match take the
    *     carried boundary value, equi-joined back on (user, bucket):
    *     the same key the big window already shuffled on, so the join
    *     reuses that exchange rather than re-shuffling the data.
    *
    * `bucketMicros` trades straggler bound against boundary-summary
    * size: pick it so a hot key's densest bucket fits one task
    * comfortably (default 1 day; a 10⁹-event/year bot key then caps
    * any task at ~3M events while the summary stays ≤365 rows/key). */
  def asOfJoinBucketed(left: DataFrame, right: DataFrame,
      bucketMicros: Long = 86400000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val r = right.select(col("user_id"), col("ts"), lit(0).as("side"),
      lit(null).cast("long").as("l_id"),
      col("event_id").as("r_id0"), col("ts").as("r_ts0"))
    val l = left.select(col("user_id"), col("ts"), lit(1).as("side"),
      col("event_id").as("l_id"),
      lit(null).cast("long").as("r_id0"), lit(null).cast("timestamp").as("r_ts0"))
    // NULL ts → the sentinel FIRST bucket, not a NULL bucket the inner
    // equi-join below would drop: [[asOfJoin]]'s single window sorts
    // NULL-ts rows first (nulls-first ordering), so they see only other
    // NULL-ts rows before them — bucketing them together below
    // Long.MinValue/…+carry reproduces exactly that order, keeping the
    // two variants row-identical even on NULL-ts input (spec-pinned).
    val uni = r.unionByName(l)
      .withColumn("bucket", when(col("ts").isNull, lit(Long.MinValue))
        .otherwise(floor(unix_micros(col("ts")) / bucketMicros)))
    val w = Window.partitionBy("user_id", "bucket")
      .orderBy(col("ts"), col("side"), col("r_id0"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = uni
      .withColumn("in_r_id", last(col("r_id0"), ignoreNulls = true).over(w))
      .withColumn("in_r_ts", last(col("r_ts0"), ignoreNulls = true).over(w))
    // per-(user, bucket) last right event; buckets holding only left rows
    // get a NULL the carry window skips over
    val carryW = Window.partitionBy("user_id").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = uni.groupBy("user_id", "bucket")
      .agg(max(when(col("side") === 0, struct(col("r_ts0"), col("r_id0")))).as("mx"))
      .select(col("user_id"), col("bucket"),
        last(col("mx"), ignoreNulls = true).over(carryW).as("prev"))
    inBucket.where(col("side") === 1)
      .join(carried, Seq("user_id", "bucket"))
      .select(col("user_id"), col("l_id"),
        coalesce(col("in_r_id"), col("prev.r_id0")).as("r_id"),
        (unix_micros(col("ts")) -
          unix_micros(coalesce(col("in_r_ts"), col("prev.r_ts0")))).as("lag_micros"))
  }

  /** Per-key exact percentiles (median + p90) of a value column. Exact
    * `percentile` sorts each group's values — the right tool when group
    * cardinality is bounded (per-key metrics); for unbounded groups at
    * extreme scale `approx_percentile` (KLL-style sketch, constant
    * memory) is the drop-in. Outputs rounded to 6 dp so the linear-
    * interpolation doubles compare stably across engines. */
  def valueQuantiles(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(keyCol).agg(
      round(expr(s"percentile($valCol, 0.5)"), 6).as("p50"),
      round(expr(s"percentile($valCol, 0.9)"), 6).as("p90"))

  /** Fixed-width value histogram per key: bucket = floor(value/width)
    * (arithmetic both engines share bit-for-bit — no `width_bucket`
    * dependency), one hash aggregate with map-side combine. */
  def valueHistogram(df: DataFrame, keyCol: String, valCol: String,
      width: Double): DataFrame =
    df.groupBy(col(keyCol), floor(col(valCol) / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Exact + approximate (HLL) distinct cardinality per key. The approx
    * path is the 100 TB one: constant memory per key vs a full shuffle of
    * distinct values. `rsd` is HLL++'s target relative standard
    * deviation (Spark default 0.05; tighter costs more registers, still
    * constant per key). */
  def distinctCardinality(df: DataFrame, keyCol: String, distinctCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(keyCol).agg(
      countDistinct(col(distinctCol)).as("exact_distinct"),
      approx_count_distinct(col(distinctCol), rsd).as("approx_distinct"))
}
