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
case class KmvDistinctSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    // order by UNSIGNED hash value
    mutable.TreeSet.empty[Long](Ordering.fromLessThan(
      (a, b) => java.lang.Long.compareUnsigned(a, b) < 0))

  override def update(buf: mutable.TreeSet[Long], input: org.apache.spark.sql.catalyst.InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      if (buf.size < k) buf += h
      else if (java.lang.Long.compareUnsigned(h, buf.last) < 0) {
        buf += h
        if (buf.size > k) buf -= buf.last
      }
    }
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach { h =>
      if (buf.size < k) buf += h
      else if (java.lang.Long.compareUnsigned(h, buf.last) < 0) {
        buf += h
        if (buf.size > k) buf -= buf.last
      }
    }
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // R = kth minimum as a fraction of the unsigned 64-bit space:
      // (kth >>> 1) / 2^63 == unsigned(kth) / 2^64 (± 1 ulp)
      val r = (buf.last >>> 1).toDouble / 9.223372036854776e18
      math.round((k - 1) / math.max(r, Double.MinPositiveValue))
    }

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf += bb.getLong)
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
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_union_estimate"

  private val impl = KmvDistinctSketch(child, k)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    impl.createAggregationBuffer()

  override def update(buf: mutable.TreeSet[Long], input: org.apache.spark.sql.catalyst.InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) impl.merge(buf, impl.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] =
    impl.merge(buf, other)

  override def eval(buf: mutable.TreeSet[Long]): Any = impl.eval(buf)
  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = impl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = impl.deserialize(bytes)

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
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_sketch"

  private val impl = KmvDistinctSketch(child, k)
  override def createAggregationBuffer(): mutable.TreeSet[Long] = impl.createAggregationBuffer()
  override def update(buf: mutable.TreeSet[Long], input: org.apache.spark.sql.catalyst.InternalRow): mutable.TreeSet[Long] =
    impl.update(buf, input)
  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] =
    impl.merge(buf, other)
  override def eval(buf: mutable.TreeSet[Long]): Any = impl.serialize(buf)
  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = impl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = impl.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
