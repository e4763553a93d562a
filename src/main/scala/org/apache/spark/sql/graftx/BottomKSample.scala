package org.apache.spark.sql.graftx

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Per-group deterministic uniform sample WITHOUT a window sort:
  * keeps the `k` rows with the lexicographically smallest `sortKey`
  * (pass a salted hash — e.g. `md5(cast(id as string))` — and the
  * bottom-k-by-hash IS a uniform random sample that is reproducible
  * across runs, partitionings, and engines).
  *
  * Why an aggregate and not `row_number() OVER (PARTITION BY g ORDER
  * BY h) <= k`: the window form shuffles EVERY row to its group's
  * partition and sorts there — at 100 TB that's a full-data exchange
  * to keep k rows per group. As a `TypedImperativeAggregate` the
  * bottom-k buffer participates in partial aggregation: each map task
  * keeps ≤ k candidates per group, the shuffle carries only those,
  * and merge keeps the k smallest of the union — the same
  * partial/merge algebra as any sum. Exchange volume drops from
  * O(rows) to O(groups × k × mapTasks), and no sort ever happens.
  *
  * Buffer = bounded max-heap of (key, payload); order-insensitive by
  * construction (the k smallest of a multiset don't depend on arrival
  * order), so results are stable — and oracle-able: DuckDB's
  * row_number formulation over the same md5 keys must agree exactly.
  * Payload is BIGINT (sample the row id; rejoin for the full row —
  * carrying whole rows through a sampling shuffle wastes the win).
  */
case class BottomKByKey(
    sortKey: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Long)]]
  with ExpectsInputTypes {

  require(k >= 1, s"k must be >= 1, got $k")

  // analysis-time contract: update() casts payload to Long and the
  // sortKey is compared as a string — reject other types at analysis
  // instead of ClassCastException on the first row
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)

  override def children: Seq[Expression] = Seq(sortKey, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k_by_key"

  // natural (String, Long) ascending ordering ⇒ dequeue yields the MAX
  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Long)] =
    mutable.PriorityQueue.empty[(String, Long)]

  private def offer(buf: mutable.PriorityQueue[(String, Long)],
                    kv: (String, Long)): Unit =
    if (buf.size < k) buf.enqueue(kv)
    else if (implicitly[Ordering[(String, Long)]].lt(kv, buf.head)) {
      buf.enqueue(kv)
      buf.dequeue()
    }

  override def update(buf: mutable.PriorityQueue[(String, Long)],
                      input: InternalRow): mutable.PriorityQueue[(String, Long)] = {
    val kEval = sortKey.eval(input)
    val p = payload.eval(input)
    if (kEval != null && p != null)
      offer(buf, (kEval.toString, p.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(String, Long)],
                     other: mutable.PriorityQueue[(String, Long)]): mutable.PriorityQueue[(String, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  /** Payloads in ascending sortKey order (deterministic). */
  override def eval(buf: mutable.PriorityQueue[(String, Long)]): Any =
    new GenericArrayData(buf.toSeq.sorted.map(_._2).toArray)

  override def serialize(buf: mutable.PriorityQueue[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed UTF-8, not writeUTF: writeUTF throws
    // UTFDataFormatException past 65535 bytes, so a raw-text sortKey
    // (instead of the intended md5) would kill the job at shuffle time
    buf.foreach { case (s, p) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(p)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.enqueue((new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(sortKey = newChildren.head, payload = newChildren(1))
}

object BottomKByKey {
  /** `bottomK(md5Key, idCol, k)` — array of the k ids with smallest keys. */
  def bottomK(sortKey: Column, payload: Column, k: Int): Column =
    ExpressionUtils.column(
      BottomKByKey(ExpressionUtils.expression(sortKey),
        ExpressionUtils.expression(payload), k).toAggregateExpression())
}
