package org.apache.spark.sql.graftx

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** K-Minimum-Values distinct-count sketch as a real
  * `TypedImperativeAggregate` (SURVEY §7.3 names sketch UDAFs as the
  * legitimate custom-aggregate use case; Spark's builtin HLL++ covers
  * the common path — KMV additionally supports set operations on
  * sketches and exposes the machinery: mutable buffer, partial
  * update, merge, and byte serialization between stages).
  *
  * Buffer = the k smallest distinct unsigned xxhash64 values of the
  * input. Estimate = (k-1) / R where R is the k-th minimum normalized
  * to [0,1); if fewer than k distinct values were seen, the count is
  * exact. Standard error ≈ 1/√(k−2).
  *
  * Deterministic and order-insensitive: the k smallest hashes of a
  * multiset don't depend on row order, so results are stable across
  * partitionings and engines.
  */
/** KMV buffer: the k-minimum hash set plus the EFFECTIVE k — carried
  * through serialization so a union of sketches built with different
  * k degrades honestly to the smallest k (the union of a saturated
  * k=128 sketch under a k=256 union would otherwise take the
  * "fewer than k seen ⇒ exact" branch and report 128 for millions).
  */
final class KmvBuf(var k: Int, val set: mutable.TreeSet[Long]) {
  def offer(h: Long): Unit = {
    if (set.size < k) { set += h; () }
    else if (java.lang.Long.compareUnsigned(h, set.last) < 0) {
      set += h
      if (set.size > k) { set -= set.last; () }
    }
  }
  def trim(): Unit = while (set.size > k) set -= set.last
}

case class KmvDistinctSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): KmvBuf =
    // order by UNSIGNED hash value
    new KmvBuf(k, mutable.TreeSet.empty[Long](Ordering.fromLessThan(
      (a, b) => java.lang.Long.compareUnsigned(a, b) < 0)))

  override def update(buf: KmvBuf, input: org.apache.spark.sql.catalyst.InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v != null) buf.offer(XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(buf: KmvBuf, other: KmvBuf): KmvBuf = {
    // mismatched builders: only the smallest k is statistically valid
    if (other.k < buf.k) { buf.k = other.k; buf.trim() }
    other.set.foreach(buf.offer)
    buf
  }

  override def eval(buf: KmvBuf): Any =
    if (buf.set.size < buf.k) buf.set.size.toLong
    else {
      // R = kth minimum as a fraction of the unsigned 64-bit space:
      // (kth >>> 1) / 2^63 == unsigned(kth) / 2^64 (± 1 ulp)
      val r = (buf.set.last >>> 1).toDouble / 9.223372036854776e18
      math.round((buf.k - 1) / math.max(r, Double.MinPositiveValue))
    }

  // Serialized layout v2: [magic "KMV2"][k][size][hashes…]. The magic
  // tag exists because kmv_sketch bytes are a PERSISTABLE artifact
  // (the per-partition rollup pattern): a layout change without a tag
  // would misread old bytes as a garbled-but-parseable sketch. Old
  // untagged bytes (and non-sketch binaries fed to kmv_union_estimate)
  // now fail loudly instead.
  private[graftx] val Magic = 0x4B4D5632 // "KMV2"

  override def serialize(buf: KmvBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + buf.set.size * 8)
    bb.putInt(Magic)
    bb.putInt(buf.k)
    bb.putInt(buf.set.size)
    buf.set.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuf = {
    require(bytes.length >= 12 && ByteBuffer.wrap(bytes).getInt == Magic,
      "unsupported KMV sketch format: expected v2 bytes " +
        "(magic 'KMV2'); re-materialize sketches with kmv_sketch")
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt // magic
    val kk = bb.getInt
    val n = bb.getInt
    require(kk > 0 && n >= 0 && n <= kk && bytes.length == 12 + n * 8L,
      s"corrupt KMV sketch: k=$kk size=$n bytes=${bytes.length}")
    val buf = createAggregationBuffer()
    buf.k = kk
    (0 until n).foreach(_ => buf.set += bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** The sketch-algebra companion: aggregates SERIALIZED KMV sketches
  * (as produced by [[KmvDistinctSketch.kmvSketch]]) into one distinct
  * estimate — the 100 TB rollup pattern where per-day/per-partition
  * sketches are materialized once and unioned cheaply at query time
  * instead of re-scanning raw data.
  */
case class KmvUnionEstimate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_union_estimate"
  // serialized sketches only — a raw value column would deserialize
  // garbage; fail at analysis, not per-row on an executor
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  private val impl = KmvDistinctSketch(child, k)

  override def createAggregationBuffer(): KmvBuf =
    impl.createAggregationBuffer()

  override def update(buf: KmvBuf, input: org.apache.spark.sql.catalyst.InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v != null) impl.merge(buf, impl.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: KmvBuf, other: KmvBuf): KmvBuf =
    impl.merge(buf, other)

  override def eval(buf: KmvBuf): Any = impl.eval(buf)
  override def serialize(buf: KmvBuf): Array[Byte] = impl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuf = impl.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvDistinctSketch {
  /** Column API: approximate COUNT(DISTINCT expr) with a k-sized
    * mergeable sketch.
    */
  def kmvDistinct(c: Column, k: Int = 256): Column =
    ExpressionUtils.column(
      KmvDistinctSketch(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** The serialized sketch itself (binary) — materialize per
    * group/partition, union later with [[kmvUnionEstimate]].
    */
  def kmvSketch(c: Column, k: Int = 256): Column =
    ExpressionUtils.column(
      KmvSketchBytes(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** Distinct estimate from a column of serialized sketches. */
  def kmvUnionEstimate(c: Column, k: Int = 256): Column =
    ExpressionUtils.column(
      KmvUnionEstimate(ExpressionUtils.expression(c), k).toAggregateExpression())
}

/** Same buffer machinery as [[KmvDistinctSketch]], but evaluates to
  * the SERIALIZED sketch (binary) instead of the estimate.
  */
case class KmvSketchBytes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_sketch"

  private val impl = KmvDistinctSketch(child, k)
  override def createAggregationBuffer(): KmvBuf = impl.createAggregationBuffer()
  override def update(buf: KmvBuf, input: org.apache.spark.sql.catalyst.InternalRow): KmvBuf =
    impl.update(buf, input)
  override def merge(buf: KmvBuf, other: KmvBuf): KmvBuf =
    impl.merge(buf, other)
  override def eval(buf: KmvBuf): Any = impl.serialize(buf)
  override def serialize(buf: KmvBuf): Array[Byte] = impl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuf = impl.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
