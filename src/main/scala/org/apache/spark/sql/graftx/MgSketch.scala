package org.apache.spark.sql.graftx

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a `TypedImperativeAggregate` —
  * the frequent-items counterpart of [[KmvDistinctSketch]]: a k-entry
  * mergeable sketch over an unbounded key domain (the "what are the
  * top tokens / domains / event types in 100 TB" question, answered in
  * one pass with k counters per partial buffer instead of a full
  * groupBy over billions of distinct keys).
  *
  * Guarantees (Misra-Gries, merge via the Agarwal et al. mergeable-
  * summaries reduction — add counts, subtract the (k+1)-th largest,
  * drop non-positive): for stream length n,
  *   - reported counts are LOWER bounds, within n/(k+1) of truth;
  *   - every item with true count > n/(k+1) is present in the summary.
  *
  * Deterministic for a fixed partitioning (counters depend on merge
  * order only through the subtraction amounts, which the error bound
  * absorbs; the coverage guarantee holds under ANY merge order).
  */
case class MgHeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with ExpectsInputTypes {

  // analysis-time type check: update() blind-casts to UTF8String, so a
  // non-string column must fail with an AnalysisException, not a
  // per-row ClassCastException in the executor
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("min_count", LongType, nullable = false))))
  override def prettyName: String = "mg_heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  private def offer(buf: mutable.HashMap[String, Long], item: String, by: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf(item) = c + by
      case None if buf.size < k => buf(item) = by
      case None if by == 1L =>
        // the hot path (update always offers weight 1): every resident
        // counter is ≥ 1 by the filter below, so the decrement is
        // exactly 1 — the classic MG step, with no extra O(k) min scan
        buf.mapValuesInPlace((_, c) => c - 1L).filterInPlace((_, c) => c > 0)
      case None =>
        // decrement-all by the offered weight, dropping exhausted counters;
        // any remainder of the offered item survives as a new counter
        val dec = math.min(by, buf.values.min)
        buf.mapValuesInPlace((_, c) => c - dec).filterInPlace((_, c) => c > 0)
        if (by > dec && buf.size < k) buf(item) = by - dec
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf(item) = buf.getOrElse(item, 0L) + c
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      buf.mapValuesInPlace((_, c) => c - cut).filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows: Array[Any] = buf.toArray
      .sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) =>
        InternalRow(UTF8String.fromString(item), c): Any
      }
    new GenericArrayData(rows)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toSeq.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.size)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf(new String(b, StandardCharsets.UTF_8)) = bb.getLong
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgHeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgHeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MgHeavyHitters {
  /** Column API: k-counter Misra-Gries summary of a string column,
    * evaluating to array<struct<item, min_count>> ordered by
    * descending count (explode it for a relational result).
    */
  def mgHeavyHitters(c: Column, k: Int): Column =
    ExpressionUtils.column(
      MgHeavyHitters(ExpressionUtils.expression(c), k).toAggregateExpression())
}
