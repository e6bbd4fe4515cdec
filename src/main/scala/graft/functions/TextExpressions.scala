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

/** Fused word-k-shingle kernel: lowercase → single-space split →
  * k-token windows → first-occurrence-distinct, in ONE loop over the
  * row's UTF8 bytes — bit-identical output (values AND order) to the
  * builtin chain `array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", slice(split(lower(c), " "), i, k))))` it replaces
  * (equivalence is spec-pinned on fixtures, unicode, and blank edge
  * cases). The builtin chain runs as CodegenFallback (`transform` is a
  * higher-order function) and allocates per element; shingling is the
  * CPU-dominant map stage under the whole MinHash dedup family, so it
  * gets the same native treatment as [[MinHashSignaturesExpr]].
  *
  * Blank semantics (must mirror [[graft.operators.TextOps.shingles]]):
  * null text, or text that is entirely `\s` whitespace, yields NULL —
  * such docs carry no n-gram signal and banding drops them. */
case class ShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 1, "shingle size must be positive")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // blank (all-whitespace) input maps to null output
  override def nullable: Boolean = true

  /** The `[ \t\n\x0B\f\r]` whitespace class (= Java `\s`) — the same
    * class `TextOps.WsClass` now spells out explicitly in BOTH engines'
    * normText/shingles regexes, since DuckDB's RE2 `\s` excludes \x0B. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** One row's shingles; shared by interpreted eval and codegen. */
  def compute(s: UTF8String): ArrayData = {
    // UTF8String.toLowerCase is what Spark's lower() runs — byte-exact,
    // locale-independent (String.toLowerCase is locale-sensitive)
    val text = s.toLowerCase.toString
    var blank = true
    var i = 0
    while (blank && i < text.length) {
      if (!isWs(text.charAt(i))) blank = false
      i += 1
    }
    if (blank) return null
    // split(lower(text), " "): single-space separator, empty tokens kept
    val toks = text.split(" ", -1)
    val n = toks.length
    val windows = math.max(n - (k - 1), 1)
    // first-occurrence order, exactly like array_distinct
    val seen = new java.util.LinkedHashSet[String](windows * 2)
    val sb = new java.lang.StringBuilder
    var w = 0
    while (w < windows) {
      sb.setLength(0)
      val end = math.min(w + k, n)
      var t = w
      while (t < end) {
        if (t > w) sb.append(' ')
        sb.append(toks(t))
        t += 1
      }
      seen.add(sb.toString)
      w += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[ShinglesExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

/** Fused SimHash kernel over a shingle array: one md5 per shingle and
  * one bit-vote loop per row — the builtin form evaluates the md5 chain
  * per element through an interpreted `transform`, then runs 32 separate
  * interpreted `filter` passes over the hash array (one per output bit).
  * Hash is the same md5-first-4-bytes the MinHash kernel and the DuckDB
  * oracle use; bit b of the fingerprint is set iff more than half the
  * shingle hashes have bit b set (Charikar'02 votes with a strict
  * majority). Null array → null (callers coalesce to the builtin form's
  * blank-doc value if they need one). */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(bits >= 1 && bits <= 32, "simhash bits must be in [1, 32]")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  /** One row's fingerprint; shared by interpreted eval and codegen. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = new Array[Byte](16)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // zero-copy + digest-into-buffer ([[Md5Kernel]]): same bytes,
        // same digest, no per-shingle allocation
        Md5Kernel.digestInto(md, arr.getUTF8String(i), d)
        val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL))
        var b = 0
        while (b < bits) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var value = 0L
    var b = 0
    while (b < bits) {
      if (2 * counts(b) > n) value |= (1L << b)
      b += 1
    }
    value
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

/** Fused anchor-hash kernel for exact substring dedup
  * ([[graft.operators.Dedup.substringDups]] x36): the 60-bit md5-prefix
  * hash of EVERY `anchorLen`-char window of the text (stride 1), as one
  * long array per row. Bit-identical to the builtin chain
  * `conv(substring(md5(substr(t, pos, len)), 1, 15), 16, 10)` per
  * position and to the DuckDB oracle's
  * `('0x' || substr(md5(substr(..)), 1, 15))::BIGINT` — the first 15
  * hex digits of an md5 are the digest's first 8 bytes (big-endian,
  * unsigned) shifted right 4 bits. The builtin chain pays, per anchor: a
  * substring copy, a 32-char hex-string allocation, and a BigInteger
  * base parse (~1.4 µs); this kernel reuses ONE MessageDigest per row
  * and hashes byte slices of the row's single UTF-8 buffer in place.
  * Windows are CODE-POINT aligned (what both engines' `substr` count).
  *
  * Null semantics: null text, or fewer than `anchorLen` code points
  * (no full window), yields NULL — explode then drops the row, exactly
  * like the `length(t) >= anchorLen` guard it backs up. */
case class AnchorHashesExpr(child: Expression, anchorLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(anchorLen >= 1, "anchor length must be positive")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // short (no full window) input maps to null output
  override def nullable: Boolean = true

  /** One row's anchor hashes; shared by interpreted eval and codegen. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    // code-point start offsets (UTF-8 walk; continuation bytes are 10xxxxxx)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      nChars += 1
      val b = bytes(i) & 0xff
      i += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
    }
    val n = nChars - anchorLen + 1
    if (n <= 0) return null
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      starts(c) = i
      c += 1
      val b = bytes(i) & 0xff
      i += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
    }
    starts(nChars) = bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = new Array[Byte](16) // digest-into-buffer: no per-anchor alloc
    val out = new Array[Long](n)
    var p = 0
    while (p < n) {
      val from = starts(p)
      val until = starts(p + anchorLen)
      md.update(bytes, from, until - from)
      md.digest(d, 0, 16) // writes the digest and resets, like digest()
      out(p) = ((((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("anchorHashes", this, classOf[AnchorHashesExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_anchor_hashes"
}

/** Column-API surface of the text kernels. */
/** Winnowing selection (Schleimer et al., SIGMOD'03): distinct sliding-
  * window minima of a hash array, first-occurrence order — semantically
  * `array_distinct(transform(sequence(1, greatest(n-w+1, 1)), i ->
  * array_min(slice(hs, i, w))))`, but O(n) via a monotonic deque where
  * the builtin chain is O(n·w) and allocates a w-element array copy per
  * window (measured 5.5 s → the kernel's fraction of that at sf0.1 on
  * x49). Arrays shorter than the window contribute their single overall
  * minimum, exactly like the truncated-slice builtin form. One
  * deliberate divergence: EMPTY input yields an empty array where the
  * builtin chain yields `[null]` (array_min of an empty slice) — the
  * empty fingerprint set is the meaningful value, and the declared
  * element type is non-null. Callers in [[graft.operators.Dedup]] never
  * feed empty arrays (length ≥ k is filtered first). */
case class WinnowExpr(child: Expression, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(w >= 1, "winnow window must be positive")

  override def inputTypes = Seq(ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** One row's winnowed minima; shared by interpreted eval and codegen. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return ArrayData.toArrayData(Array.empty[Long])
    val wins = math.max(n - w + 1, 1)
    val mins = new Array[Long](wins)
    val dq = new Array[Int](n) // monotonic deque of indices, values increasing
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      if (i >= w - 1) {
        while (dq(head) <= i - w) head += 1
        mins(i - w + 1) = arr.getLong(dq(head))
      }
      i += 1
    }
    if (n < w) mins(0) = arr.getLong(dq(head)) // single truncated window
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < wins) { seen.add(mins(j)); j += 1 }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    ArrayData.toArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object TextKernels {
  def topRunCount(arr: Column): Column =
    Bridge.column(TopRunCountExpr(Bridge.expression(arr)))
  def shingles(text: Column, k: Int): Column =
    Bridge.column(ShinglesExpr(Bridge.expression(text), k))
  def simHash(shingleArr: Column, bits: Int): Column =
    Bridge.column(SimHashExpr(Bridge.expression(shingleArr), bits))
  def anchorHashes(text: Column, anchorLen: Int): Column =
    Bridge.column(AnchorHashesExpr(Bridge.expression(text), anchorLen))
  def winnow(hashArr: Column, w: Int): Column =
    Bridge.column(WinnowExpr(Bridge.expression(hashArr), w))
}
