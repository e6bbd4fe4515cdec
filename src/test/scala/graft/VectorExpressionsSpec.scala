package graft

import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native DotProduct / CosineSimilarity expressions: bit-exact with the
  * builtin fold chain (the numeric contract the DuckDB oracle relies
  * on), working under codegen and interpreted eval, callable from SQL. */
class VectorExpressionsSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    .cache()

  private def builtinDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("DotProduct is bit-exact with the builtin left-fold chain") {
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .where(col("a.vec_id") < col("b.vec_id")).limit(2000)
    val diff = pairs.select(
        VectorFunctions.dotProduct(col("a.v"), col("b.v")).as("native"),
        builtinDot(col("a.v"), col("b.v")).as("builtin"))
      .where(col("native") =!= col("builtin")) // exact compare, no epsilon
      .count()
    assert(diff === 0)
  }

  test("CosineSimilarity matches dot/(sqrt·sqrt) composition exactly") {
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .where(col("a.vec_id") < col("b.vec_id")).limit(2000)
    val composed = builtinDot(col("a.v"), col("b.v")) /
      (sqrt(builtinDot(col("a.v"), col("a.v"))) * sqrt(builtinDot(col("b.v"), col("b.v"))))
    val diff = pairs.select(
        VectorFunctions.cosineSimilarity(col("a.v"), col("b.v")).as("native"),
        composed.as("builtin"))
      .where(col("native") =!= col("builtin"))
      .count()
    assert(diff === 0)
  }

  test("interpreted eval agrees with codegen") {
    val withCodegen = emb.limit(50).select(
      VectorFunctions.cosineSimilarity(col("v"), col("v")).as("c")).collect()
    // self-cosine is exactly 1.0 up to fp: dot/(sqrt(d)*sqrt(d))
    withCodegen.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = emb.limit(50).select(
        VectorFunctions.cosineSimilarity(col("v"), col("v")).as("c")).collect()
      assert(interpreted.map(_.getDouble(0)).toSeq ==
        withCodegen.map(_.getDouble(0)).toSeq)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null input yields null; float arrays implicitly cast") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0D, 2.0D), array(3.0D, 4.0D)),
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(1.0D, 1.0D))
        |AS t(a, b)""".stripMargin)
    val out = df.select(VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
      .collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
    // float32 input casts implicitly (the embeddings fixture path)
    val f = Tables.embeddings(spark, sf).limit(5)
      .select(VectorFunctions.dotProduct(col("embedding"), col("embedding")).as("d"))
      .collect()
    f.foreach(r => assert(r.getDouble(0) > 0.0))
  }

  test("registered SQL functions graft_dot / graft_cosine / graft_top_run_count work in SQL text") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D,2.0D), array(3.0D,4.0D)) AS d, " +
        "graft_cosine(array(1.0D,0.0D), array(1.0D,0.0D)) AS c, " +
        "graft_top_run_count(array('b','a','b','c','b')) AS t").collect()(0)
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getInt(2) === 3)
  }
}
