package graft.operators

import graft.operators.Analytics.{asDouble, dec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-table relational queries over the star schema — the equi-join /
  * aggregation surface the engine exposes beyond the reference's own
  * driver-side joins (SURVEY.md §2.11). Shapes follow TPC-H Q1/Q3/Q5 so
  * the bench exercises realistic scan→join→agg→top-k plans.
  *
  * Scale design: dimension tables (`region`, `nation`, small `customer`
  * slices) are broadcast — no shuffle of the fact table for those joins;
  * the fact-fact joins (orders⋈lineitem) hash-partition on the join key,
  * which AQE can re-plan at runtime for skew. Money sums are decimal —
  * exact and associative, so partial aggregation is lossless.
  */
object Relational {

  /** Q1-shaped pricing summary: one scan of lineitem, partial+final hash
    * agg, 6-group output. The shipdate predicate pushes to parquet. */
  def pricingSummary(lineitem: DataFrame, shipBefore: String): DataFrame =
    lineitem
      .where(col("l_shipdate") <= lit(shipBefore).cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        asDouble(sum(dec(col("l_quantity")))).as("sum_qty"),
        asDouble(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        asDouble(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q3-shaped segment revenue top-k: broadcast the filtered customer
    * dimension into orders, shuffle-join lineitem on the order key, then
    * `TakeOrderedAndProject` (no global sort materialization). */
  def topRevenueOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      segment: String, k: Int): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.where(col("c_mktsegment") === segment)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(asDouble(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))
        .as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(k)

  /** Event-stream enrichment (§2.11 streaming-join floor, batch twin):
    * the event fact joined to the customer→nation dimension chain,
    * aggregated per (nation, event type). Both dimensions broadcast, so
    * the fact side never shuffles for the join — one agg shuffle total.
    *
    * Deliberately stream-agnostic: pass a STREAMING events frame and the
    * same code is a stateless stream-static enrichment (the static side
    * re-broadcasts per micro-batch, no state store); with
    * `outputMode("complete")` its end state equals this batch form —
    * the property StreamingSpec pins. */
  def eventEnrichment(events: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame =
    events
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("user_id") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "event_type")
      .agg(count(lit(1)).as("n_events"),
        asDouble(sum(dec(col("value")))).as("sum_value"))
      .orderBy("n_name", "event_type")

  /** Q5-shaped per-nation revenue within one region: the whole dimension
    * chain region→nation→customer broadcasts (catalog-sized at any SF);
    * only orders⋈lineitem shuffles. */
  def regionRevenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
      orders: DataFrame, lineitem: DataFrame, regionName: String): DataFrame = {
    val dims = customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region.where(col("r_name") === regionName),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy("n_name")
      .agg(asDouble(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))
        .as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** [[regionRevenue]] with the dimension join SALTED instead of
    * broadcast ([[Skew.saltedJoin]]) — the plan for when the build side
    * outgrows the broadcast threshold AND the fact side's customer keys
    * skew: hot keys scatter over `buckets` reducers. Result-identical to
    * the broadcast form (same oracle). */
  def regionRevenueSalted(region: DataFrame, nation: DataFrame, customer: DataFrame,
      orders: DataFrame, lineitem: DataFrame, regionName: String,
      buckets: Int): DataFrame = {
    val dims = customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region.where(col("r_name") === regionName),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"))
    val fact = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .withColumn("c_custkey", col("o_custkey"))
    Skew.saltedJoin(fact, dims, "c_custkey", buckets)
      .groupBy("n_name")
      .agg(asDouble(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))
        .as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** Semi/anti-join surface on real keys: orders that have at least one /
    * no high-quantity lineitem. `left_semi` = EXISTS (no row explosion);
    * `left_anti` = NOT EXISTS. */
  def ordersWithBigLines(orders: DataFrame, lineitem: DataFrame,
      minQty: Double, anti: Boolean): DataFrame =
    orders.join(lineitem.where(col("l_quantity") >= minQty)
        .select(col("l_orderkey")),
      col("o_orderkey") === col("l_orderkey"),
      if (anti) "left_anti" else "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
}
