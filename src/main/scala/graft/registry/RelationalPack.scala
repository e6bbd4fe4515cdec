package graft.registry

import graft.operators.Relational
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table equi-join / aggregation surface over the star schema
  * (SURVEY.md §2.11); TPC-H-shaped so the bench exercises realistic
  * scan→join→agg→top-k physical plans. */
object RelationalPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h1_pricing_summary" -> ((s, dir) =>
      Relational.pricingSummary(Tables.lineitem(s, dir), "1998-09-02 00:00:00")),
    "h3_top_revenue" -> ((s, dir) =>
      Relational.topRevenueOrders(
        Tables.customer(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir),
        "BUILDING", 10)),
    "h5_region_revenue" -> ((s, dir) =>
      Relational.regionRevenue(
        Tables.region(s, dir), Tables.nation(s, dir), Tables.customer(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir), "ASIA")),
    "h9_salted_region_revenue" -> ((s, dir) =>
      Relational.regionRevenueSalted(
        Tables.region(s, dir), Tables.nation(s, dir), Tables.customer(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir), "ASIA", buckets = 8)),
    // batch twin of the stream-static enrichment join (StreamingSpec
    // proves the streaming end state equals this exact plan)
    "h10_event_enrichment" -> ((s, dir) =>
      Relational.eventEnrichment(
        Tables.events(s, dir), Tables.customer(s, dir), Tables.nation(s, dir))),
    "h7_orders_semi" -> ((s, dir) =>
      Relational.ordersWithBigLines(
        Tables.orders(s, dir), Tables.lineitem(s, dir), 49.0, anti = false)
        .orderBy("o_orderkey")),
    "h8_orders_anti" -> ((s, dir) =>
      Relational.ordersWithBigLines(
        Tables.orders(s, dir), Tables.lineitem(s, dir), 49.0, anti = true)
        .orderBy("o_orderkey")),
  )

  def oracle: Map[String, String] = Map(
    "h1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "h3_top_revenue" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "h5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "h9_salted_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "h10_event_enrichment" ->
      """SELECT n_name, event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |JOIN customer ON user_id = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, event_type
        |ORDER BY n_name, event_type""".stripMargin,
    "h7_orders_semi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "h8_orders_anti" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
  )
}
