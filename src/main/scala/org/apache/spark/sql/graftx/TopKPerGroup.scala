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

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val groupE = groupExprs
    val orderE = ordering
    val kk = k
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(groupE, schema)
      val rowOrd = new LazilyGeneratedOrdering(orderE, schema)
      // BoundedPriorityQueue keeps the maxSize LARGEST under its
      // Ordering; we want the rows that sort FIRST → feed the reverse
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

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
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
