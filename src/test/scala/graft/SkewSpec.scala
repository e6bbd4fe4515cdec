package graft

import graft.operators.{Relational, Skew}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted joins must be row-identical (as multisets) to their unsalted
  * twins — salting redistributes work, never results. */
class SkewSpec extends AnyFunSuite with SparkSpec {

  test("salted join equals plain inner join as a multiset") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"), col("o_totalprice"))
    val customer = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(df.columns.map(col): _*).count()
        .orderBy(df.columns.map(col) :+ col("count"): _*)
        .collect().toSeq
    val plain = orders.join(customer, Seq("c_custkey"))
    val salted = Skew.saltedJoin(orders, customer, "c_custkey", buckets = 7)
      .select(plain.columns.map(col): _*) // align column order
    assert(canon(salted) === canon(plain))
  }

  test("salted region revenue equals the broadcast form") {
    def run(f: => org.apache.spark.sql.DataFrame) = f.collect().toSeq
    val a = run(Relational.regionRevenue(
      Tables.region(spark, sf), Tables.nation(spark, sf), Tables.customer(spark, sf),
      Tables.orders(spark, sf), Tables.lineitem(spark, sf), "ASIA"))
    val b = run(Relational.regionRevenueSalted(
      Tables.region(spark, sf), Tables.nation(spark, sf), Tables.customer(spark, sf),
      Tables.orders(spark, sf), Tables.lineitem(spark, sf), "ASIA", buckets = 8))
    assert(a === b)
  }

  test("salt fan-out: replicated side carries every salt value") {
    val small = Tables.region(spark, sf)
    val big = Tables.nation(spark, sf).select(col("n_regionkey").as("r_regionkey"), col("n_name"))
    val joined = Skew.saltedJoin(big, small, "r_regionkey", buckets = 4)
    // every (nation, region) pair appears exactly once — replication
    // never duplicates matches
    assert(joined.count() === big.join(small, Seq("r_regionkey")).count())
  }
}
