package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The composed builtin form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * allocates an intermediate product array per row and evaluates three
  * lambda closures; these expressions run the same arithmetic as a tight
  * fused loop inside whole-stage codegen — one pass, zero allocation.
  * Numeric contract: strictly sequential left-to-right accumulation in
  * array index order, IDENTICAL to the fold the builtin chain (and the
  * DuckDB `list_reduce` oracle) performs, so results stay bit-exact with
  * both.
  *
  * Null semantics: null input → null (`nullIntolerant`); null ELEMENTS
  * are the caller's responsibility (embedding vectors are dense).
  */
abstract class VectorBinaryExpression extends BinaryExpression
    with ImplicitCastInputTypes with Serializable {
  // return type inferred: Seq[ArrayType] <: Seq[AbstractDataType]
  // (the parent type is private[sql] and cannot be named here)
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
}

/** dot(a, b) = Σ a(i)·b(i), left-to-right. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** cosine(a, b) = dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b))), all three
  * accumulators advanced in one fused pass. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

/** Column-API and SQL-name surface of the native expressions. */
object VectorFunctions {
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def cosineSimilarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Extract a literal-int argument from SQL-text function calls (the
    * kernel shape parameters are plan-time constants, never row data). */
  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _)
        if v.longValue() == v.intValue() =>
      v.intValue()
    case other =>
      throw new IllegalArgumentException(
        s"$fn: shape argument must be a literal integer, got $other")
  }

  private[functions] val entries: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    ("graft_top_run_count",
      new ExpressionInfo(classOf[TopRunCountExpr].getName, "graft_top_run_count"),
      (es: Seq[Expression]) => TopRunCountExpr(es(0))),
    ("graft_shingles",
      new ExpressionInfo(classOf[ShinglesExpr].getName, "graft_shingles"),
      (es: Seq[Expression]) => ShinglesExpr(es(0), litInt(es(1), "graft_shingles"))),
    ("graft_simhash",
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (es: Seq[Expression]) => SimHashExpr(es(0), litInt(es(1), "graft_simhash"))),
    ("graft_anchor_hashes",
      new ExpressionInfo(classOf[AnchorHashesExpr].getName, "graft_anchor_hashes"),
      (es: Seq[Expression]) =>
        AnchorHashesExpr(es(0), litInt(es(1), "graft_anchor_hashes"))),
    ("graft_winnow",
      new ExpressionInfo(classOf[WinnowExpr].getName, "graft_winnow"),
      (es: Seq[Expression]) => WinnowExpr(es(0), litInt(es(1), "graft_winnow"))),
    ("graft_misra_gries",
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_misra_gries"),
      (es: Seq[Expression]) =>
        MisraGriesAgg(es(0), litInt(es(1), "graft_misra_gries"))))

  /** Idempotent in-session registration — makes `graft_dot`/`graft_cosine`
    * callable from SQL text without rebuilding the session. */
  def register(spark: SparkSession): Unit =
    entries.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** `SparkSessionExtensions` hook (the production path:
  * `spark.sql.extensions=graft.functions.GraftExtensions`): injects the
  * native functions into every session built with the extension. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // single source of truth: the same registry the in-session
    // VectorFunctions.register path uses
    VectorFunctions.entries.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.NanoWatermarkPushdown)
  }
}
