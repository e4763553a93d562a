package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** The scale claims as regression tests, not documentation: filters
  * push to the parquet scans, dims broadcast, top-k never global-sorts,
  * the pipeline doesn't multiply exchanges. Runs against sf0.001 (plan
  * shapes are scale-invariant pre-AQE).
  */
class PlanShapeSpec extends SparkSpec {
  // sf0.01, NOT sf0.001: MartInvariantsSpec caches the sf0.001 mart,
  // and a matching plan would resolve to InMemoryRelation here, hiding
  // the join/exchange operators these tests assert on.
  private val dir = "/root/testdata/sf0.01"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    // unwrap AQE wrapper so we see the real operators
    val roots = p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
    val scan = if (roots.isEmpty) Seq(p) else roots
    scan.flatMap(_.collect(pf))
  }

  private def planString(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("a1_groupby_agg: shipdate filter is pushed to the parquet scan") {
    val s = planString("a1_groupby_agg")
    assert(s.contains("PushedFilters") && s.contains("LessThanOrEqual(l_shipdate"),
      s"expected pushed shipdate filter in:\n$s")
  }

  test("p1_select_cast_filter: range predicates pushed, schema pruned") {
    val s = planString("p1_select_cast_filter")
    assert(s.contains("GreaterThanOrEqual(l_discount,0.05)"))
    assert(!s.contains("l_returnflag"), "untouched columns must not be read")
  }

  test("j1_join_groupby: all three dims join as broadcast hash joins") {
    val joins = collectAll(plan("j1_join_groupby")) {
      case b: BroadcastHashJoinExec => b
    }
    assert(joins.size >= 3, s"expected >=3 broadcast joins, got ${joins.size}")
  }

  test("o2_topk: TakeOrderedAndProject, no global Sort") {
    val s = planString("o2_topk")
    assert(s.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$s")
  }

  test("pipe_mart: bounded exchange count (dedup+pivot+join+sort)") {
    val exchanges = collectAll(plan("pipe_mart")) {
      case e: ShuffleExchangeExec => e
    }
    // dedup window (user_id,ts) + single-pass pivot (user_id,hour) +
    // dim dedup + final orderBy; the dim join must broadcast
    assert(exchanges.size <= 4, s"pipe_mart grew extra shuffles: ${exchanges.size}")
    val bcasts = collectAll(plan("pipe_mart")) { case b: BroadcastHashJoinExec => b }
    assert(bcasts.nonEmpty, "dim enrichment must broadcast")
  }

  test("ann_bruteforce_topk: query side broadcasts; FloatVecDot in plan") {
    val p = plan("ann_bruteforce_topk")
    val bcasts = collectAll(p) { case b: BroadcastHashJoinExec => b }
    val s = p.toString
    assert(s.contains("float_vec_dot") || s.contains("FloatVecDot") ||
      bcasts.nonEmpty || s.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast + native dot in:\n$s")
  }

  // The LSH-shape assertions target the OPERATORS directly: since r7
  // the registered queries also run the brute-force exact twin to pin
  // recall in a hashed row, so the query plans legitimately contain a
  // BNLJ (the twin) — the scale claim lives in the LSH path itself.
  private def embPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("embeddingLshPairs operator: equi-joins only — no BNLJ, no cartesian") {
    val emb = Tables.load(spark, dir, "embeddings")
    val s = embPlan(graft.operators.SimilarityOps.embeddingLshPairsAuto(
      emb, "vec_id", "embedding", dim = 64, bands = 12, minSim = 0.45))
    assert(!s.contains("BroadcastNestedLoopJoin"),
      s"embedding near-dup must not plan an all-pairs join:\n$s")
    assert(!s.contains("CartesianProduct"),
      s"embedding near-dup must not plan a cartesian product:\n$s")
  }

  test("lshTopK operator: banded candidates join without BNLJ/cartesian") {
    val emb = Tables.load(spark, dir, "embeddings")
    val s = embPlan(graft.operators.SimilarityOps.lshTopKAuto(
      emb, "vec_id", "embedding", dim = 64, bands = 8, k = 5))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"LSH top-k must stay on equi-join buckets:\n$s")
  }

  test("dd_minhash_lsh: band exchanges carry no array payload (24B rows, not shingles)") {
    val exchanges = collectAll(plan("dd_minhash_lsh")) {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    val bandExchanges = exchanges.filter(
      _.output.exists(a => a.name == "band_hash" || a.name == "band_val"))
    assert(bandExchanges.nonEmpty, "expected the banded candidate exchange in the plan")
    bandExchanges.foreach { e =>
      assert(!e.output.exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]),
        s"band exchange must not carry shingle arrays: ${e.output.map(a => s"${a.name}:${a.dataType.simpleString}")}")
    }
  }

  test("dd_embedding_lsh: band exchanges carry no vector payload") {
    val emb = Tables.load(spark, dir, "embeddings")
    val opPlan = graft.operators.SimilarityOps.embeddingLshPairsAuto(
      emb, "vec_id", "embedding", dim = 64, bands = 12, minSim = 0.45)
      .queryExecution.executedPlan
    val exchanges = collectAll(opPlan) {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    val bandExchanges = exchanges.filter(_.output.exists(_.name == "band_val"))
    assert(bandExchanges.nonEmpty, "expected the banded candidate exchange in the plan")
    bandExchanges.foreach { e =>
      assert(!e.output.exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]),
        s"band exchange must not carry embeddings: ${e.output.map(a => s"${a.name}:${a.dataType.simpleString}")}")
    }
  }

  // Queries whose NON-equi join is the point: deliberate small-n
  // brute-force baselines that oracle-check a bucketed scale path.
  // Everything else must plan equi-joins only — or BNLJs whose build
  // side is a FIXED-size modulus sample (see sampledBuildSide below):
  // the recall/exactness twins of ann_lsh_topk, dd_embedding_lsh,
  // dd_embedding_clusters_lsh, dd_simhash, mm_embed_neardup and
  // ann_pca_topk all broadcast an `id % k = 0` thinned query set, so
  // their cost is O(n·s) with s fixed and they need no exemption.
  private val quadraticByDesign = Set(
    "dd_embedding_cosine", // all-pairs cosine — oracle twin of dd_embedding_lsh
    "ann_bruteforce_topk", // exact top-k baseline — oracle twin of ann_lsh_topk
    "ann_two_stage",       // rescore stage compares vs the brute-force baseline
    "fz_edit_pairs",       // short-string bucket brute-forced (q-gram bound vacuous there)
    "fz_damerau_pairs",    // same short-string bucket, DL verify
    // IVF probe RANKING is sampled queries × the k-row broadcast
    // cell-centroid aggregate — O(s·k) with both factors fixed (s = 64
    // modulus-sampled queries, k = the cell count); the build side is
    // a grouped aggregate, so not scalar-detectable. The corpus-wide
    // assignment that used to need this exemption in ann_ivf_train too
    // is now a pure map over a driver-broadcast table — no join at all.
    // ann_ivf_pq_append and ann_ivf_pq_filtered run the same
    // ivfPqSearch ranking (append: over the appended index; filtered:
    // with the metadata pre-filter), so they carry the same O(s·k)
    // cross.
    "ann_ivf_search", "ann_ivf_pq", "ann_ivf_pq_append",
    "ann_ivf_pq_filtered"
  )

  test("engine-wide sweep: no accidental cartesian/nested-loop join in ANY query") {
    // plan construction only (sf0.001 keeps the sink/iterative queries
    // cheap); catches a non-equi join slipping into a production path.
    // A BNLJ whose BUILD side is a global (ungrouped) aggregate is the
    // legitimate scalar-broadcast pattern — crossJoin(broadcast(1-row
    // totals)) — and allowed; everything else nested-loop/cartesian
    // is an accident.
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    def scalarSubtree(p: SparkPlan): Boolean = p.collectFirst {
      case h: HashAggregateExec if h.groupingExpressions.isEmpty => ()
      case h: ObjectHashAggregateExec if h.groupingExpressions.isEmpty => ()
      case h: SortAggregateExec if h.groupingExpressions.isEmpty => ()
    }.nonEmpty
    // The sampled-twin pattern: the build side is a modulus-thinned
    // FIXED-size query sample (`id % k = 0`, k = n/target — see
    // SimilarityOps.sampleModulus), so the BNLJ is O(n·s) with s
    // pinned, not O(n²). Detected as a Filter whose condition carries
    // a Remainder-vs-literal equality in the build subtree.
    // Only TOP-LEVEL conjuncts count, and the comparand must be the
    // literal 0: `condition.exists` would descend into Not(...), so a
    // build side filtered with the O(n) COMPLEMENT `id % k != 0`
    // (which also CONTAINS an EqualTo(Remainder, Literal)) would
    // wrongly exempt a genuinely quadratic BNLJ.
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, Literal, Remainder}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def sampledBuildSide(p: SparkPlan): Boolean = p.collectFirst {
      case f: org.apache.spark.sql.execution.FilterExec
        if conjuncts(f.condition).exists {
          case EqualTo(r: Remainder, Literal(0L | 0, _)) => r.right.isInstanceOf[Literal]
          case EqualTo(Literal(0L | 0, _), r: Remainder) => r.right.isInstanceOf[Literal]
          case _ => false
        } => ()
    }.nonEmpty
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(quadraticByDesign)
      .flatMap { name =>
        try {
          val p = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
            .queryExecution.executedPlan
          val bad = collectAll(p) {
            case c: CartesianProductExec => s"CartesianProduct: ${c.simpleString(1)}"
            case b: BroadcastNestedLoopJoinExec
              if {
                val build = b.buildSide match {
                  case BuildLeft => b.left; case BuildRight => b.right
                }
                !scalarSubtree(build) && !sampledBuildSide(build)
              } => s"non-scalar, non-sampled BNLJ: ${b.simpleString(1)}"
          }
          bad.headOption.map(name -> _)
        } catch { case e: Throwable => Some(name -> s"BUILD FAILED: ${e.getMessage}") }
      }
    assert(offenders.isEmpty,
      offenders.map { case (n, s) => s"$n: $s" }.mkString("\n"))
  }
}
