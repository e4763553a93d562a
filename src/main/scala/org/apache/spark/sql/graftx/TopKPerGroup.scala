package org.apache.spark.sql.graftx

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.util.BoundedPriorityQueue

/** Whole-operator Catalyst extension (SURVEY §7.3 path (c)): top-k
  * rows per group WITHOUT sorting.
  *
  * The window-function formulation (`row_number() OVER (PARTITION BY g
  * ORDER BY v) <= k`) forces a full sort of every group's rows — at
  * 100 TB that's a sort (and likely a spill) of the whole table to
  * keep k rows per group. This operator keeps a bounded k-element
  * heap per group instead:
  *
  *  - partial stage (pre-shuffle): each input partition reduces to at
  *    most k rows per group it has seen — the top-k analog of map-side
  *    combine; shuffle volume is ≤ k·groups·partitions, independent of
  *    input rows;
  *  - final stage (post-shuffle, clustered on the group key): heaps
  *    merge candidates to the exact global top-k per group.
  *
  * O(n log k) work, O(groups·k) memory, no sort, no spill. Planned via
  * [[TopKStrategy]] (SparkSessionExtensions.injectPlannerStrategy);
  * both stages are the same physical node, differing only in their
  * required child distribution — EnsureRequirements inserts the
  * exchange between them.
  */
case class TopKPerGroup(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
                        k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  // empty grouping would reach ClusteredDistribution(Nil)'s require at
  // planning time as an internal-looking crash; reject it here with a
  // usable message (global top-k is TakeOrderedAndProject's job)
  require(groupExprs.nonEmpty,
    "topKPerGroup needs at least one group column; for GLOBAL top-k use orderBy(...).limit(k)")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val partialStage = TopKPerGroupExec(g, o, k, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, partialStage) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
                            k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  // the final stage's rows are still clustered however EnsureRequirements
  // satisfied ClusteredDistribution(groupExprs) — advertise it so a
  // downstream groupBy/join on the same keys reuses the exchange
  // instead of shuffling the top-k output again
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  // All-fixed-width rows have ONE canonical UnsafeRow layout: an 8-byte
  // null word (per 64 fields) + one 8-byte word per field. Such rows
  // pack into a primitive long-pool heap (below) at 8·(1+nFields)
  // bytes flat per kept row — the copied-UnsafeRow heap costs ~3× that
  // in object/array headers and boxes every entry for the GC. At
  // production ANN geometry (candK ∝ √n, every partition seeing every
  // query group) the per-task product groups·k·entry is the operator's
  // whole memory story: the 20M-vector decade probe OOM'd a 24 g heap
  // on the object version (64 query heaps × 89,460 candidates × 32
  // concurrent tasks) and fits in <6 GB packed.
  private def allFixedWidth: Boolean = child.output.forall(a =>
    org.apache.spark.sql.catalyst.expressions.UnsafeRow
      .isFixedLength(a.dataType))

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val groupE = groupExprs
    val orderE = ordering
    val kk = k
    val packed = allFixedWidth
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(groupE, schema)
      val rowOrd = new LazilyGeneratedOrdering(orderE, schema)
      if (packed) {
        val nFields = schema.length
        val words = // null-bitset words + one word per fixed-width field
          UnsafeRow.calculateBitSetWidthInBytes(nFields) / 8 + nFields
        val heaps = scala.collection.mutable.HashMap
          .empty[UnsafeRow, PackedRowHeap]
        // rows from codegen/exchange are UnsafeRows already in the
        // canonical fixed-width layout; anything else (or a row whose
        // size disagrees, e.g. future format drift) is converted once
        val toUnsafe = UnsafeProjection.create(schema.map(_.dataType).toArray)
        iter.foreach { row =>
          val key = keyProj(row)
          val heap = heaps.getOrElse(key, null) match {
            case null =>
              val h = new PackedRowHeap(kk, words, nFields, rowOrd)
              heaps.put(key.copy(), h)
              h
            case h => h
          }
          val u = row match {
            case ur: UnsafeRow if ur.getSizeInBytes == words * 8 => ur
            case other => toUnsafe(other)
          }
          heap.offer(u)
        }
        heaps.valuesIterator.flatMap(_.iterator)
      } else {
        // var-width rows (strings, arrays): the copied-row heap — entry
        // sizes are data-dependent, so there is no flat pool to pack
        val heaps = scala.collection.mutable.HashMap
          .empty[UnsafeRow, BoundedPriorityQueue[InternalRow]]
        iter.foreach { row =>
          val key = keyProj(row)
          val heap = heaps.getOrElse(key, null) match {
            case null =>
              val h = new BoundedPriorityQueue[InternalRow](kk)(rowOrd.reverse)
              heaps.put(key.copy(), h) // iterator reuses the key buffer — copy
              h
            case h => h
          }
          // only COPY rows the heap will actually admit: on the hot path
          // (heap full, row loses to the current k-th) virtually every
          // row is rejected, and an unconditional row.copy() would pay a
          // fresh UnsafeRow allocation per rejected row
          if (heap.size < kk || rowOrd.reverse.gt(row, heap.head)) {
            heap += row.copy(); ()
          }
        }
        heaps.valuesIterator.flatMap(_.iterator)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Bounded binary heap of FIXED-WIDTH UnsafeRows stored flat in one
  * primitive long pool — no per-entry objects, no per-entry arrays,
  * nothing for the GC to trace. Keeps the k rows that sort FIRST
  * under `ord`; the root is the WORST kept row (max-heap under `ord`),
  * so a full heap admits a candidate with one root comparison and
  * replaces in place. Entry cost is exactly the row's canonical
  * UnsafeRow bytes (8·(bitsetWords+nFields)); the copied-row
  * BoundedPriorityQueue version costs ~3× that in object/array
  * headers plus a queue box per entry, and its millions of small
  * allocations are what actually killed the 20M ANN decade (GC →
  * heap exhaustion). Admission parity with the object heap: admit
  * while not full, else only STRICTLY better than the root —
  * among order-equal rows the earlier-arrived survive (call sites
  * make orderings total with a unique tie-break anyway).
  */
private[graftx] final class PackedRowHeap(k: Int, words: Int, nFields: Int,
    ord: Ordering[InternalRow]) {
  import org.apache.spark.unsafe.Platform
  require(k.toLong * words <= (Int.MaxValue >> 3),
    s"packed heap of $k rows x $words words exceeds one array")
  // grow-on-demand: a group that never fills (sparse cells, small
  // corpora) must not pre-pay k entries of pool
  private var cap = math.min(k, 64)
  private var pool = new Array[Long](cap * words)
  private val bytes = words * 8
  private var n = 0
  private def ensure(m: Int): Unit = if (m > cap) {
    cap = math.min(k, math.max(cap * 2, m))
    pool = java.util.Arrays.copyOf(pool, cap * words)
  }
  private val rowA = new UnsafeRow(nFields)
  private val rowB = new UnsafeRow(nFields)
  private val tmp = new Array[Long](words)

  private def point(r: UnsafeRow, i: Int): UnsafeRow = {
    r.pointTo(pool, Platform.LONG_ARRAY_OFFSET + i.toLong * bytes, bytes); r
  }
  private def cmp(i: Int, j: Int): Int =
    ord.compare(point(rowA, i), point(rowB, j))
  private def copyIn(src: UnsafeRow, i: Int): Unit =
    Platform.copyMemory(src.getBaseObject, src.getBaseOffset,
      pool, Platform.LONG_ARRAY_OFFSET + i.toLong * bytes, bytes)
  private def swap(i: Int, j: Int): Unit = {
    System.arraycopy(pool, i * words, tmp, 0, words)
    System.arraycopy(pool, j * words, pool, i * words, words)
    System.arraycopy(tmp, 0, pool, j * words, words)
  }
  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (cmp(i, p) > 0) { swap(i, p); i = p } else return
    }
  }
  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      var m = i
      if (l < n && cmp(l, m) > 0) m = l
      if (l + 1 < n && cmp(l + 1, m) > 0) m = l + 1
      if (m == i) return
      swap(i, m); i = m
    }
  }
  def offer(row: UnsafeRow): Unit =
    if (n < k) { ensure(n + 1); copyIn(row, n); n += 1; siftUp(n - 1) }
    else if (ord.compare(row, point(rowA, 0)) < 0) { copyIn(row, 0); siftDown(0) }
  /** Kept rows in heap (not sorted) order. The returned UnsafeRow is
    * REUSED across next() — the standard Spark iterator contract
    * (consumers that buffer must copy), same as every scan/join.
    */
  def iterator: Iterator[InternalRow] = new Iterator[InternalRow] {
    private var i = 0
    private val r = new UnsafeRow(nFields)
    override def hasNext: Boolean = i < n
    override def next(): InternalRow = { point(r, i); i += 1; r }
  }
}

/** Dataset-level entry point. */
object GraftPlans {
  private[graftx] val registrationLock = new Object

  /** Exact top-k rows per group under `order` — (column, ascending?)
    * pairs, resolved by name against `df` (row_number semantics: make
    * the order total, e.g. end with a unique tie-break column, for
    * deterministic results).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   order: Seq[(String, Boolean)], k: Int): DataFrame = {
    // float/double group keys bypass NormalizeFloatingNumbers (the rule
    // only rewrites Aggregate/Window/Join), so 0.0 vs -0.0 and distinct
    // NaN bit patterns would silently split one logical group in two —
    // reject them like SQL engines reject grouping on approximate types
    groupCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt != org.apache.spark.sql.types.FloatType &&
        dt != org.apache.spark.sql.types.DoubleType,
        s"topKPerGroup: group column $c is $dt — float group keys split " +
          "0.0/-0.0 and NaN bit patterns; bucket or cast them first")
    }
    // self-register the strategy so plain sessions (no
    // GraftExtensions wiring) can still plan the node; lock so two
    // threads' first use can't append it twice
    val spark = df.sparkSession
    GraftPlans.registrationLock.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKStrategy
    }
    val child = df.queryExecution.analyzed
    val resolver = spark.sessionState.analyzer.resolver
    def attr(n: String): Attribute = {
      val hits = child.output.filter(a => resolver(a.name, n))
      if (hits.isEmpty) throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name)}")
      if (hits.size > 1) throw new IllegalArgumentException(
        s"column $n is ambiguous in ${child.output.map(_.name)}")
      hits.head
    }
    val sortOrders = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      TopKPerGroup(groupCols.map(attr), sortOrders, k, child))
  }
}
