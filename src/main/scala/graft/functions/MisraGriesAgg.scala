package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982; mergeable form
  * per Agarwal et al., "Mergeable Summaries", PODS'12) as a native
  * [[TypedImperativeAggregate]] — the bounded-memory path to "top
  * tokens over a 100 TB corpus", where the exact pass
  * ([[TopTokens.langTopTokens]]) must shuffle and count EVERY distinct
  * token and a 10¹⁰-key vocabulary would swamp the aggregation hash
  * maps. The sketch holds at most `k` counters per group, ever, on
  * update AND merge paths — executor memory is O(k · groups),
  * corpus-size-independent.
  *
  * Guarantees (any input order, any partitioning/merge tree — proofs in
  * the PODS'12 paper, spec-pinned here): for every token t with true
  * count c(t),
  *   - counter(t), when present, satisfies c(t) − n/(k+1) ≤ counter(t) ≤ c(t);
  *   - every t with c(t) > n/(k+1) IS in the sketch (coverage) —
  *     where n is the group's total token count.
  * The candidate SET beyond that floor depends on merge order (which
  * Spark does not fix), so correctness-gated queries must assert the
  * order-independent guarantees, not the raw sketch ([[graft.registry
  * .PipelinePack]] x51 does exactly that, the u2 error-bound device).
  *
  * Returns `map<string, long>` of surviving counters. */
case class MisraGriesAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 1, "sketch size must be positive")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](k * 2)

  private def add(buf: java.util.HashMap[String, Long], t: String,
      c: Long): Unit = MisraGries.add(buf, t, c, k)

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(b1, e.getKey, e.getValue)
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    // key-sorted map literal: the buffer's hash order must never leak
    // into the output value
    val keys = new java.util.ArrayList[String](buf.keySet())
    java.util.Collections.sort(keys)
    val n = keys.size()
    val ks = new Array[AnyRef](n)
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = keys.get(i)
      ks(i) = UTF8String.fromString(t)
      vs(i) = buf.get(t)
      i += 1
    }
    new ArrayBasedMapData(ArrayData.toArrayData(ks), ArrayData.toArrayData(vs))
  }

  // length-prefixed raw UTF-8, NOT writeUTF: writeUTF throws past 64 KB
  // of encoded bytes, and a raw-crawl "token" (unbroken base64 blob,
  // minified JS) can exceed that — the sketch must survive any input
  // the exact counting path would.
  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](k * 2)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesAgg {
  /** The sketch as an aggregate Column: `misraGries(col, k)`. */
  def misraGries(c: Column, k: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(c), k).toAggregateExpression())
}

/** The Misra–Gries insert, shared by the batch aggregate and the
  * streaming tracker ([[graft.streaming.StreamingHeavyHitters]]) so the
  * two paths can never implement different sketches. */
object MisraGries {
  /** Weighted MG insert: bump the counter; on overflow past k keys,
    * subtract the minimum counter from every key and drop the zeros —
    * at least one key (the minimum) leaves, so size is ≤ k after every
    * add. Each subtraction of m discounts ≥ (k+1)·m input weight, which
    * is where the n/(k+1) undercount bound comes from. */
  def add(buf: java.util.HashMap[String, Long], t: String, c: Long,
      k: Int): Unit = {
    val cur = buf.getOrDefault(t, 0L)
    buf.put(t, cur + c)
    if (buf.size > k) {
      var m = Long.MaxValue
      val it0 = buf.values().iterator()
      while (it0.hasNext) { val v = it0.next(); if (v < m) m = v }
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - m
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
    }
  }
}
