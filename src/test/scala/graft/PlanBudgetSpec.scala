package graft

import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Exchange/sort budgets for the flagship plans, pinned against a
  * golden manifest. [[PlanShapeSpec]] bans cartesians and unpushed
  * filters; it does NOT stop a regression that quietly adds a shuffle
  * to a composite (a lost broadcast hint, a new repartition, a window
  * that stops sharing its neighbor's partitioning). Every shuffle is a
  * full materialize-and-redistribute of the stream — at 100 TB an
  * extra one on a fact table is minutes of cluster time — so the
  * budget IS the performance contract, asserted per commit.
  *
  * Budgets are ceilings (an improvement that REMOVES a shuffle
  * passes; tighten the manifest when one lands), measured at sf0.01 on
  * the INITIAL physical plan (pre-AQE re-optimization — what the
  * optimizer committed to before runtime stats, which is the planning
  * regression this guards). Iterative queries (CC rounds, Lloyd
  * iterations) have data-dependent round counts; their budgets hold
  * for the sf0.01 fixture and exist to catch per-round shape changes,
  * not round-count drift — which BenchNotes' scaling runs watch.
  */
class PlanBudgetSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  /** query -> (max ShuffleExchangeExec, max SortExec) in the initial
    * plan. Values are MEASURED from the audited sf0.01 plans (probe:
    * per-exchange partitioning dumped and each attributed below), not
    * aspirational — the point is to freeze the audited shape, and a
    * final `orderBy` (canonical oracle output) always contributes one
    * range exchange + one global sort.
    */
  private val budgets: Map[String, (Int, Int)] = Map(
    // dedup window (hash + 2 local sorts) + pivot agg + dim-side
    // freshest-survivor window (tiny side, r9 determinism trade)
    // + final orderBy
    "pipe_mart" -> (4, 5),
    // two-phase distinct agg: partial by (n_name, o_orderkey) then by
    // n_name — Spark's standard COUNT(DISTINCT) shape — + final orderBy
    "j6_star_join" -> (3, 1),
    // broadcast dim join (0 exchanges) + one agg shuffle + final orderBy
    "j1_join_groupby" -> (2, 1),
    "o2_topk" -> (1, 0),
    "o3b_topn_heap" -> (2, 1),
    "a1_groupby_agg" -> (2, 1),
    "dd_exact" -> (2, 1),
    "dd_minhash_lsh" -> (8, 2),
    "dd_ngram_jaccard" -> (8, 2),
    // 2 SinglePartition basis/mean aggs + stage-1 pcos rank window +
    // rescore cos rank window + sampled exact twin's rank window and
    // SMJ sides — every sort is over a bounded candidate set (≤ k·|Q|)
    "ann_pca_topk" -> (6, 7),
    "tx_tfidf" -> (6, 2),
    "tx_bpe_apply" -> (4, 2),
    // row_number window (exchange + local sort each side of the
    // exchange per EnsureRequirements) + final orderBy
    "w1_window_dedup" -> (2, 3),
    // Expand + multi-column distinct agg (hash over grouping-id key,
    // SortAggregate fallback for the float column) + SinglePartition
    // final sort over the per-column summary rows
    "dq_profile" -> (2, 3),
    // composite: exact-dedup fingerprint window, near-dup CC rounds
    // (doc_id / (doc_id, g)), decontamination fingerprint join, split
    // assignment agg + final orderBy
    "pipe_curate" -> (9, 3),
    // r11 broadcast-verify shape: bucket-stats agg + bucket join +
    // survivors-only distinct, with the remaining exchanges belonging
    // to the SAMPLED exact-twin recall harness (broadcast cosine scan
    // + left join + final agg) — the candidate set itself no longer
    // crosses an exchange (the r11 100x scratch-disk fix)
    "dd_embedding_lsh" -> (9, 2)
  )

  private def counts(p: SparkPlan): (Int, Int) = {
    val roots = p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
    val scan = if (roots.isEmpty) Seq(p) else roots
    val sh = scan.map(_.collect { case e: ShuffleExchangeExec => e }.size).sum
    val so = scan.map(_.collect { case s: SortExec => s }.size).sum
    (sh, so)
  }

  budgets.toSeq.sortBy(_._1).foreach { case (name, (maxSh, maxSo)) =>
    test(s"$name stays within its exchange budget (<=$maxSh shuffles, <=$maxSo sorts)") {
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
      val (sh, so) = counts(p)
      assert(sh <= maxSh && so <= maxSo,
        s"$name plan budget exceeded: $sh shuffles (max $maxSh), $so sorts " +
          s"(max $maxSo) — a regression added an exchange, or tighten the manifest")
    }
  }
}
