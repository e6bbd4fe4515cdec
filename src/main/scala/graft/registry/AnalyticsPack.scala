package graft.registry

import graft.operators.Analytics
import graft.sources.Tables
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytic builtin surface (SURVEY.md §2.5-§2.7, §2.11): window
  * functions, rollup/cube, tumbling buckets, distinct cardinality, set
  * operations. */
object AnalyticsPack extends QueryPack {

  private def env(s: SparkSession, dir: String): DataFrame =
    Tables.envelope(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture;
    // (…, l_partkey, l_suppkey) is — required for a deterministic frame.
    "w1_ranked_running" -> ((s, dir) =>
      Analytics.rankedRunning(Tables.lineitem(s, dir),
        "l_orderkey", Seq("l_linenumber", "l_partkey", "l_suppkey"), "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),
    "w2_deltas" -> ((s, dir) =>
      Analytics.deltas(Tables.events(s, dir), "event_type", "event_id", "value")
        .orderBy("event_type", "event_id")),
    "g1_rollup" -> ((s, dir) =>
      Analytics.rollupCounts(Tables.lineitem(s, dir),
        "l_returnflag", "l_linestatus", "l_quantity")
        .orderBy("l_returnflag", "l_linestatus")),
    "g2_cube" -> ((s, dir) =>
      Analytics.cubeCounts(
        env(s, dir).select(col(Idx),
          date_format(col(UpdatedAt), "yyyy-MM-dd").as("day")),
        Idx, "day")
        .orderBy(Idx, "day")),
    "tw1_tumbling_counts" -> ((s, dir) =>
      Analytics.tumblingCounts(Tables.events(s, dir), "ts", "hour", "event_type")
        .orderBy("bucket", "event_type")),
    "g3_grouping_sets" -> ((s, dir) =>
      Analytics.groupingSetCounts(Tables.lineitem(s, dir),
        "l_returnflag", "l_linestatus")
        .orderBy("l_returnflag", "l_linestatus")),
    "tw2_sliding_counts" -> ((s, dir) =>
      Analytics.slidingCounts(Tables.events(s, dir), "ts", "1 hour", "30 minutes", "event_type")
        .orderBy("bucket", "event_type")),
    "tw3_session_counts" -> ((s, dir) =>
      Analytics.sessionCounts(Tables.events(s, dir), "ts", "8 hours", "user_id")
        .orderBy("user_id", "session_start")),
    // batch twin of the stream-stream interval join (StreamingSpec pins
    // the streaming append end state equal to this plan)
    "tw4_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Analytics.intervalJoin(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "purchase"), "1 HOUR")
        .orderBy("l_id", "r_id")
    }),
    // as-of join: each purchase attributed to the user's latest click
    // at-or-before it (union-tag + one window per user — no builtin)
    "tw5_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Analytics.asOfJoin(
        ev.where(col("event_type") === "purchase"),
        ev.where(col("event_type") === "click"))
        .orderBy("l_id")
    }),
    // skew-safe as-of variant: identical semantics via (user, time-bucket)
    // windows + a boundary carry pass — the hot-key plan shape
    "tw6_asof_bucketed" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Analytics.asOfJoinBucketed(
        ev.where(col("event_type") === "purchase"),
        ev.where(col("event_type") === "click"))
        .orderBy("l_id")
    }),
    // renamed from a7 (collided with SURVEY A7 sync tallies)
    "u1_distinct_users" -> ((s, dir) =>
      Analytics.distinctCardinality(Tables.events(s, dir), "event_type", "user_id")
        .select(col("event_type"), col("exact_distinct"))
        .orderBy("event_type")),
    // Error-BOUND registration, not a rows-only hole: the HLL estimate
    // itself can't be mirrored in DuckDB, but its 5% accuracy contract
    // CAN — emit (key, exact, |approx−exact|/exact ≤ 0.05) and let the
    // oracle assert the bound holds (its side is trivially TRUE; a
    // drifting HLL flips the Spark side to false → hash-red). rsd=0.01
    // sizes the sketch so the 5% check isn't riding the default sketch's
    // own 5% std-dev edge.
    "u2_approx_distinct" -> ((s, dir) =>
      Analytics.distinctCardinality(Tables.events(s, dir), "event_type", "user_id",
          rsd = 0.01)
        .select(col("event_type"), col("exact_distinct"),
          (abs(col("approx_distinct") - col("exact_distinct"))
            <= col("exact_distinct").cast("double") * 0.05).as("within_5pct"))
        .orderBy("event_type")),
    "u3_value_quantiles" -> ((s, dir) =>
      Analytics.valueQuantiles(Tables.events(s, dir), "event_type", "value")
        .orderBy("event_type")),
    "u4_value_histogram" -> ((s, dir) =>
      Analytics.valueHistogram(Tables.events(s, dir), "event_type", "value", 50.0)
        .orderBy("event_type", "bucket")),
    "set1_intersect" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.where(col("user_id") % 2 === 0).select("event_type").distinct()
        .intersect(e.where(col("user_id") % 2 === 1).select("event_type").distinct())
        .orderBy("event_type")
    }),
    "set2_except" -> ((s, dir) => {
      val e = env(s, dir)
      e.where(col(Idx) === "click")
        .select(get_json_object(col(Document), "$.k").as("k")).distinct()
        .except(e.where(col(Idx) === "error")
          .select(get_json_object(col(Document), "$.k").as("k")).distinct())
        .orderBy("k")
    }),
    "set3_union" -> ((s, dir) =>
      Tables.events(s, dir).select(col("event_type").as("tag"))
        .union(Tables.documents(s, dir).select(col("lang").as("tag")))
        .distinct()
        .orderBy("tag")),
  )

  def oracle: Map[String, String] = Map(
    "w1_ranked_running" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rnk,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_val
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "w2_deltas" ->
      """SELECT event_type, event_id,
        |  value AS val,
        |  CAST(CAST(value AS DECIMAL(18,2)) - lag(CAST(value AS DECIMAL(18,2)), 1)
        |    OVER w AS DOUBLE) AS delta,
        |  lead(event_id, 1) OVER w AS next_ord
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id)
        |ORDER BY event_type, event_id""".stripMargin,
    "g1_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "g2_cube" ->
      """WITH env AS (
        |  SELECT event_type AS idx, strftime(ts, '%Y-%m-%d') AS day FROM events
        |)
        |SELECT COALESCE(idx, 'ALL') AS idx, COALESCE(day, 'ALL') AS day,
        |  count(*) AS n
        |FROM env GROUP BY CUBE(idx, day)
        |ORDER BY idx, day""".stripMargin,
    "tw1_tumbling_counts" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,
    "g3_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tw2_sliding_counts" ->
      """WITH expanded AS (
        |  SELECT event_type,
        |    time_bucket(INTERVAL '30 minutes', ts) - k.off * INTERVAL '30 minutes' AS bucket_ts
        |  FROM events CROSS JOIN (VALUES (0), (1)) AS k(off)
        |)
        |SELECT strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket, event_type,
        |  count(*) AS n
        |FROM expanded GROUP BY bucket_ts, event_type
        |ORDER BY bucket, event_type""".stripMargin,
    "tw3_session_counts" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL '8 hours' THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m
        |)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  strftime(max(ts) + INTERVAL '8 hours', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        |  count(*) AS n
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // epoch_us integer math so the µs-truncation semantics match Spark's
    // micros timestamps exactly at the interval bounds
    "tw4_interval_join" ->
      """SELECT c.user_id, c.event_id AS l_id, p.event_id AS r_id,
        |  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS lag_micros
        |FROM events c JOIN events p ON p.user_id = c.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND epoch_us(CAST(p.ts AS TIMESTAMP)) >= epoch_us(CAST(c.ts AS TIMESTAMP))
        |  AND epoch_us(CAST(p.ts AS TIMESTAMP)) <= epoch_us(CAST(c.ts AS TIMESTAMP)) + 3600000000
        |ORDER BY l_id, r_id""".stripMargin,
    // LATERAL with an explicit ORDER BY ... LIMIT 1, not DuckDB's native
    // ASOF JOIN: ASOF leaves equal-timestamp ties unspecified, and the
    // hash-compare needs the same deterministic tiebreak as the Spark
    // window (ts DESC, event_id DESC)
    "tw5_asof_join" ->
      """SELECT p.user_id, p.event_id AS l_id, c.r_id,
        |  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.r_ts AS TIMESTAMP)) AS lag_micros
        |FROM events p LEFT JOIN LATERAL (
        |  SELECT r.event_id AS r_id, r.ts AS r_ts
        |  FROM events r
        |  WHERE r.event_type = 'click' AND r.user_id = p.user_id AND r.ts <= p.ts
        |  ORDER BY r.ts DESC, r.event_id DESC
        |  LIMIT 1
        |) c ON TRUE
        |WHERE p.event_type = 'purchase'
        |ORDER BY l_id""".stripMargin,
    // bucketing changes the physical plan, never the result: tw6's oracle
    // is tw5's, verbatim
    "tw6_asof_bucketed" ->
      """SELECT p.user_id, p.event_id AS l_id, c.r_id,
        |  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.r_ts AS TIMESTAMP)) AS lag_micros
        |FROM events p LEFT JOIN LATERAL (
        |  SELECT r.event_id AS r_id, r.ts AS r_ts
        |  FROM events r
        |  WHERE r.event_type = 'click' AND r.user_id = p.user_id AND r.ts <= p.ts
        |  ORDER BY r.ts DESC, r.event_id DESC
        |  LIMIT 1
        |) c ON TRUE
        |WHERE p.event_type = 'purchase'
        |ORDER BY l_id""".stripMargin,
    "u1_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the oracle's bound-check is trivially TRUE (exact vs exact); the
    // Spark side computes it against the real HLL estimate — the hash
    // compare IS the error-bound assertion
    "u2_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_distinct,
        |  TRUE AS within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "u3_value_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "u4_value_histogram" ->
      """SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bucket,
        |  count(*) AS n
        |FROM events GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,
    "set1_intersect" ->
      """SELECT event_type FROM events WHERE user_id % 2 = 0
        |INTERSECT
        |SELECT event_type FROM events WHERE user_id % 2 = 1
        |ORDER BY event_type""".stripMargin,
    "set2_except" ->
      """SELECT json_extract_string(props, '$.k') AS k FROM events
        |WHERE event_type = 'click'
        |EXCEPT
        |SELECT json_extract_string(props, '$.k') AS k FROM events
        |WHERE event_type = 'error'
        |ORDER BY k""".stripMargin,
    "set3_union" ->
      """SELECT event_type AS tag FROM events
        |UNION
        |SELECT lang AS tag FROM documents
        |ORDER BY tag""".stripMargin,
  )
}
