package org.apache.spark.sql.graftx

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests") — the quantile companion to the
  * distinct-count KMV sketch ([[KmvDistinctSketch]]): a mergeable,
  * bounded-size summary whose rank error is relative to q(1-q), i.e.
  * tails (p99/p999) are far more accurate than a uniform-error sketch
  * of the same size. The 100 TB pattern is the same as KMV's: digest
  * per shard/day in one pass (map-side partial agg), persist the bytes,
  * union at query time instead of re-scanning raw data.
  *
  * Scale function k1(q) = (δ/2π)·asin(2q−1): centroid capacity shrinks
  * toward both tails, so extreme quantiles are interpolated from
  * near-singleton centroids. Buffer holds up to 8δ points, then
  * compresses by a sorted sweep merging neighbors while
  * k1(q_hi) − k1(q_lo) ≤ 1.
  *
  * Unlike KMV, a t-digest is merge-order dependent: different
  * partitionings give slightly different (all within-bound) estimates.
  * Queries over it are therefore rows-only checked; the specs assert
  * rank-error bounds against exact quantiles and partitioning
  * insensitivity within tolerance.
  */
final class TDig(val delta: Int) {
  // (mean, weight) points; unsorted between compressions
  val pts = mutable.ArrayBuffer.empty[(Double, Long)]
  var lo: Double = Double.PositiveInfinity
  var hi: Double = Double.NegativeInfinity

  def totalWeight: Long = pts.iterator.map(_._2).sum

  // set on add/merge, cleared by compress(): lets quantile() skip the
  // O(c log c) re-sort when nothing changed (eval maps over P
  // percentages — only the first should pay for compression)
  private var dirty = true

  def add(x: Double, w: Long = 1L): Unit = {
    // skip NaN like null: one NaN row would otherwise poison centroid
    // means in compress() and turn every quantile into NaN silently
    if (x.isNaN || w <= 0L) return
    pts += ((x, w))
    dirty = true
    if (x < lo) lo = x
    if (x > hi) hi = x
    if (pts.length > 8 * delta) compress()
  }

  def mergeIn(other: TDig): Unit = {
    other.pts.foreach { case (m, w) => pts += ((m, w)) }
    dirty = true
    if (other.lo < lo) lo = other.lo
    if (other.hi > hi) hi = other.hi
    if (pts.length > 8 * delta) compress()
  }

  private def k1(q: Double): Double =
    delta / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

  def compress(): Unit = {
    if (!dirty) return
    dirty = false
    if (pts.length <= 1) return
    val sorted = pts.sortBy(_._1)
    val w = sorted.iterator.map(_._2).sum.toDouble
    pts.clear()
    var (curM, curW) = sorted.head
    var done = 0L // weight of completed centroids
    sorted.iterator.drop(1).foreach { case (m, pw) =>
      val q0 = done / w
      val q2 = (done + curW + pw) / w
      if (k1(q2) - k1(q0) <= 1.0) {
        // weighted-mean merge keeps the centroid inside its span
        curM = (curM * curW + m * pw) / (curW + pw)
        curW += pw
      } else {
        pts += ((curM, curW)); done += curW
        curM = m; curW = pw
      }
    }
    pts += ((curM, curW))
  }

  /** Quantile by midpoint interpolation over compressed centroids,
    * clamped to the tracked exact [lo, hi].
    */
  def quantile(q: Double): Double = {
    compress()
    if (pts.isEmpty) return Double.NaN
    if (pts.length == 1) return pts.head._1
    val w = pts.iterator.map(_._2).sum.toDouble
    val target = q * w
    // cumulative weight at each centroid's midpoint
    var cum = 0.0
    var prevMid = 0.0
    var prevMean = lo
    var i = 0
    while (i < pts.length) {
      val (m, pw) = pts(i)
      val mid = cum + pw / 2.0
      if (target <= mid) {
        val span = mid - prevMid
        val f = if (span <= 0) 0.0 else (target - prevMid) / span
        return math.min(hi, math.max(lo, prevMean + f * (m - prevMean)))
      }
      cum += pw; prevMid = mid; prevMean = m; i += 1
    }
    // beyond the last midpoint: interpolate toward the exact max
    val span = w - prevMid
    val f = if (span <= 0) 1.0 else (target - prevMid) / span
    math.min(hi, math.max(lo, prevMean + math.min(1.0, f) * (hi - prevMean)))
  }

  def serialize(): Array[Byte] = {
    compress()
    val bb = ByteBuffer.allocate(4 + 16 + pts.length * 16)
    bb.putInt(pts.length).putDouble(lo).putDouble(hi)
    pts.foreach { case (m, w) => bb.putDouble(m).putLong(w) }
    bb.array()
  }
}

object TDig {
  def deserialize(bytes: Array[Byte], delta: Int): TDig = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val d = new TDig(delta)
    d.lo = bb.getDouble; d.hi = bb.getDouble
    (0 until n).foreach(_ => d.pts += ((bb.getDouble, bb.getLong)))
    d
  }
}

/** approx quantiles of a numeric column via t-digest → array<double>
  * (one per requested percentage). Project `element_at(..., i)` to
  * scalar columns in queries — the driver checker can't sort arrays.
  */
case class TDigestQuantiles(
    child: Expression,
    percentages: Seq[Double],
    compression: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDig]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "tdigest_quantiles"

  override def createAggregationBuffer(): TDig = new TDig(compression)

  // NumericType via ExpectsInputTypes (below): the old toString
  // fallback let a string/date column silently parse or fail per-row
  override def inputTypes: Seq[AbstractDataType] = Seq(NumericType)

  override def update(buf: TDig, input: InternalRow): TDig = {
    val v = child.eval(input)
    if (v != null) buf.add(v match {
      case n: java.lang.Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalStateException(
        s"tdigest_quantiles: unexpected non-numeric value $other")
    })
    buf
  }

  override def merge(buf: TDig, other: TDig): TDig = { buf.mergeIn(other); buf }

  override def eval(buf: TDig): Any =
    if (buf.pts.isEmpty) null
    else new GenericArrayData(percentages.map(buf.quantile).toArray)

  override def serialize(buf: TDig): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDig = TDig.deserialize(bytes, compression)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** The serialized digest itself (binary) — materialize per group or
  * shard, union later with [[TDigestUnionQuantiles]].
  */
case class TDigestSketchBytes(
    child: Expression,
    compression: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDig] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "tdigest_sketch"

  private val impl = TDigestQuantiles(child, Seq(0.5), compression)
  override def createAggregationBuffer(): TDig = impl.createAggregationBuffer()
  override def update(buf: TDig, input: InternalRow): TDig = impl.update(buf, input)
  override def merge(buf: TDig, other: TDig): TDig = impl.merge(buf, other)
  override def eval(buf: TDig): Any = buf.serialize()
  override def serialize(buf: TDig): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDig = TDig.deserialize(bytes, compression)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestSketchBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestSketchBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Quantiles from a column of SERIALIZED digests (the shard-rollup
  * read side).
  */
case class TDigestUnionQuantiles(
    child: Expression,
    percentages: Seq[Double],
    compression: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDig]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "tdigest_union_quantiles"
  // serialized digests only — a raw value column would deserialize
  // garbage; fail at analysis, not per-row on an executor
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override def createAggregationBuffer(): TDig = new TDig(compression)

  override def update(buf: TDig, input: InternalRow): TDig = {
    val v = child.eval(input)
    if (v != null) buf.mergeIn(TDig.deserialize(v.asInstanceOf[Array[Byte]], compression))
    buf
  }

  override def merge(buf: TDig, other: TDig): TDig = { buf.mergeIn(other); buf }

  override def eval(buf: TDig): Any =
    if (buf.pts.isEmpty) null
    else new GenericArrayData(percentages.map(buf.quantile).toArray)

  override def serialize(buf: TDig): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDig = TDig.deserialize(bytes, compression)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestUnionQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestUnionQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** WEIGHTED approx quantiles: each row contributes its (positive
  * integer) weight to the distribution — the sample-weight-aware
  * percentile a training pipeline needs for importance-weighted
  * corpora, where plain SQL has no answer short of row explosion.
  * Rows with null/non-positive weight are ignored.
  */
case class TDigestWeightedQuantiles(
    valueExpr: Expression,
    weightExpr: Expression,
    percentages: Seq[Double],
    compression: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDig]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(valueExpr, weightExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "tdigest_weighted_quantiles"
  override def inputTypes: Seq[AbstractDataType] = Seq(NumericType, NumericType)

  private def toDouble(v: Any): Double = v match {
    case n: java.lang.Number => n.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalStateException(
      s"tdigest_weighted_quantiles: unexpected non-numeric value $other")
  }

  override def createAggregationBuffer(): TDig = new TDig(compression)

  override def update(buf: TDig, input: InternalRow): TDig = {
    val v = valueExpr.eval(input)
    val w = weightExpr.eval(input)
    if (v != null && w != null) {
      val wl = math.round(toDouble(w))
      if (wl > 0) buf.add(toDouble(v), wl)
    }
    buf
  }

  override def merge(buf: TDig, other: TDig): TDig = { buf.mergeIn(other); buf }

  override def eval(buf: TDig): Any =
    if (buf.pts.isEmpty) null
    else new GenericArrayData(percentages.map(buf.quantile).toArray)

  override def serialize(buf: TDig): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDig = TDig.deserialize(bytes, compression)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestWeightedQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestWeightedQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), weightExpr = newChildren(1))
}

object TDigest {
  /** Column API: approx quantiles (array, one per percentage). */
  def tdigestQuantiles(c: Column, percentages: Seq[Double], compression: Int = 100): Column =
    ExpressionUtils.column(
      TDigestQuantiles(ExpressionUtils.expression(c), percentages, compression)
        .toAggregateExpression())

  /** The serialized digest (binary) for shard-level materialization. */
  def tdigestSketch(c: Column, compression: Int = 100): Column =
    ExpressionUtils.column(
      TDigestSketchBytes(ExpressionUtils.expression(c), compression)
        .toAggregateExpression())

  /** Quantiles from a column of serialized digests. */
  def tdigestUnionQuantiles(c: Column, percentages: Seq[Double], compression: Int = 100): Column =
    ExpressionUtils.column(
      TDigestUnionQuantiles(ExpressionUtils.expression(c), percentages, compression)
        .toAggregateExpression())

  /** Sample-weight-aware quantiles (positive integer weights). */
  def tdigestWeightedQuantiles(value: Column, weight: Column,
                               percentages: Seq[Double], compression: Int = 100): Column =
    ExpressionUtils.column(
      TDigestWeightedQuantiles(ExpressionUtils.expression(value),
        ExpressionUtils.expression(weight), percentages, compression)
        .toAggregateExpression())
}
