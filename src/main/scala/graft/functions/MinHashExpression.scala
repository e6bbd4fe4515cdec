package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Allocation-free md5 plumbing shared by the digest kernels
  * ([[MinHashSignaturesExpr]], [[graft.functions.SimHashExpr]],
  * [[graft.functions.AnchorHashesExpr]]) — optimization guide step 4
  * (per-task work): at millions of shingles per task, the per-call
  * `s.getBytes` copy (UTF8String elements of an UnsafeArrayData are
  * slices of a shared buffer, so getBytes always copies) and the
  * 16-byte array `digest()` returns are pure GC churn. Bit-identical
  * output: `update(base, offset, len)` hashes exactly the same bytes,
  * and `digest(out, 0, 16)` writes the same digest (and resets, like
  * the allocating form). */
private[functions] object Md5Kernel {
  def digestInto(md: MessageDigest, s: UTF8String, out: Array[Byte]): Unit = {
    s.getBaseObject match {
      case b: Array[Byte] =>
        md.update(b, (s.getBaseOffset - Platform.BYTE_ARRAY_OFFSET).toInt,
          s.numBytes)
      case _ => md.update(s.getBytes) // off-heap-backed string: rare, copy
    }
    md.digest(out, 0, 16)
    ()
  }
}

/** Fused MinHash signature kernel: one pass over a document's shingle
  * array computing all `a.length` permutation minima —
  * `sig_j = min over shingles s of (a_j·(md5_32(s) mod p) + b_j) mod p`,
  * where `md5_32` is the first-8-hex-digits md5 prefix (bit-identical to
  * the `conv(substring(md5(s),1,8),16,10)` builtin chain and the DuckDB
  * oracle; see [[graft.operators.TextOps.hash32]]).
  *
  * Why a native expression: the composable forms are interpreted, not
  * codegen'd. Higher-order functions (`transform`/`aggregate`) are
  * CodegenFallback — per-element lambda dispatch — and the
  * explode→16-min-aggs form pays interpreted row assembly per exploded
  * shingle plus a full shuffle of the hash table (measured 2.1 s at
  * sf0.1 vs 0.1 s for the same md5 arithmetic in a fused loop). This
  * kernel runs one tight JVM loop per document — one MessageDigest
  * instance amortized over the row, zero intermediate arrays — and turns
  * signature computation into a pure map-only projection: no explode
  * (52× row inflation), no aggregation shuffle. At corpus scale the
  * dominant dedup stage becomes scan-bound instead of shuffle-bound.
  *
  * Null semantics mirror the aggregate form it replaces: null array →
  * null; null/absent shingles contribute nothing; an array with no
  * non-null element → null (`min` over an empty/all-null group is null).
  */
case class MinHashSignaturesExpr(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(a.length == b.length && a.nonEmpty, "permutation parameter arity mismatch")

  // return type inferred: Seq[ArrayType] <: Seq[AbstractDataType]
  // (the parent type is private[sql] and cannot be named here)
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // compute() returns null for a NON-null input (empty/all-null array),
  // so the result is nullable regardless of child nullability; without
  // this override a non-nullable child would make nullSafeCodeGen emit
  // `false = ...` for the ev.isNull assignment — uncompilable codegen.
  override def nullable: Boolean = true

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  /** `p == 2³¹−1` in every production instantiation ([[graft.operators
    * .Dedup.P]]) — a Mersenne prime, whose reduction is two shift-add
    * folds instead of a 64-bit division (`2³¹ ≡ 1 (mod p)`, so
    * `x = hi·2³¹ + lo ≡ hi + lo`). The inner loop runs k=16 reductions
    * per shingle, and hardware division was its dominant cost
    * (guide step 4: per-task work). EXACT for all x in [0, 2⁶²]: the
    * first fold leaves ≤ 2³²+2³¹, the second ≤ p+2, the conditional
    * subtract finishes — pinned against `%` in VectorExpressionsSpec
    * and by every oracle-gated signature consumer. */
  private val mersenne = p == 0x7fffffffL
  @inline private def modP(x: Long): Long =
    if (mersenne) {
      var r = (x & 0x7fffffffL) + (x >>> 31)
      r = (r & 0x7fffffffL) + (r >>> 31)
      if (r >= 0x7fffffffL) r - 0x7fffffffL else r
    } else x % p

  /** One row's signatures; shared by interpreted eval and codegen. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val k = aArr.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = MessageDigest.getInstance("MD5")
    val d = new Array[Byte](16)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        Md5Kernel.digestInto(md, arr.getUTF8String(i), d)
        // first 8 hex chars of md5 = first 4 bytes, big-endian unsigned
        val h = modP((((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)))
        var j = 0
        while (j < k) {
          val v = modP(h * aArr(j) + bArr(j))
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignaturesExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

/** Column-API surface of the MinHash kernel. */
object MinHash {
  def signatures(sh: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    Bridge.column(MinHashSignaturesExpr(Bridge.expression(sh), a, b, p))
}
