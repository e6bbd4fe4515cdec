package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused most-frequent-element counter: the count of the most frequent
  * string in an array, computed as one sort + one linear run-scan per
  * row. Replaces the `aggregate(array_sort(...))` higher-order-function
  * fold in the Gopher quality/repetition filters ([[graft.operators
  * .TextOps.qualityFilter]] x15, `repetitionMetrics` x27): HOFs run as
  * CodegenFallback — per-element lambda dispatch with boxed
  * intermediates — while this kernel is one tight JVM loop over the
  * array's UTF8Strings (same measured class of win as
  * [[MinHashSignaturesExpr]], which cut its query 14× at sf0.1). The
  * count is order-insensitive (any total order groups equal values), so
  * binary UTF8String comparison needs no collation care.
  *
  * Null semantics mirror the fold it replaces over our inputs (token /
  * n-gram arrays never carry null elements — `split` and `concat_ws`
  * cannot produce them): null array → null; empty array → 0. Null
  * ELEMENTS, impossible upstream, are skipped defensively.
  */
case class TopRunCountExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // return type inferred: Seq[ArrayType] <: Seq[AbstractDataType]
  // (the parent type is private[sql] and cannot be named here)
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  /** One row's top-run count; shared by interpreted eval and codegen. */
  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    val vals = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) vals.add(arr.getUTF8String(i))
      i += 1
    }
    if (vals.isEmpty) return 0
    java.util.Collections.sort(vals)
    var best = 0
    var run = 0
    var prev: UTF8String = null
    var j = 0
    while (j < vals.size()) {
      val v = vals.get(j)
      run = if (prev != null && v.equals(prev)) run + 1 else 1
      if (run > best) best = run
      prev = v
      j += 1
    }
    best
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topRun", this, classOf[TopRunCountExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_top_run_count"
}

/** Column-API surface of the text kernels. */
object TextKernels {
  def topRunCount(arr: Column): Column =
    Bridge.column(TopRunCountExpr(Bridge.expression(arr)))
}
