package graft.operators

import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

/** Pins the stats-gated broadcast discipline added after the r12
  * 1000×-tier OOM (an unconditional `broadcast(dim)` hint bypasses
  * autoBroadcastJoinThreshold, so a corpus-growing dim eventually
  * kills the build side). Both directions of every gate:
  *
  *   - under the bound → the hint fires and the join IS a
  *     BroadcastHashJoin (the 100 TB fact-never-shuffles shape);
  *   - above the bound (conf'd down) → the hint is withheld and the
  *     plan carries no broadcast of the dim (Catalyst plans the
  *     shuffle join; correctness unchanged);
  *   - `requireBroadcastable` (sides with NO non-broadcast plan)
  *     fails FAST above the bound, naming the conf and the remedy,
  *     instead of OOMing mid-job.
  */
class BroadcastGateSpec extends graft.SparkSpec {
  import spark.implicits._

  private val conf = "spark.graft.broadcastDimBound"

  private lazy val facts =
    (1L to 5000L).map(i => (i % 100, i.toDouble)).toDF("k", "v")
  private lazy val dim =
    (0L until 100L).map(i => (i, s"name$i")).toDF("k", "name")

  private def hasBhj(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.sparkPlan.exists {
      case _: BroadcastHashJoinExec => true
      case _ => false
    }

  test("broadcastIfFits: hints under the bound, withholds above it; same rows either way") {
    // tiny dim, default bound: the hint must fire even though we also
    // disable Spark's own auto threshold — proving it's OUR hint, not
    // the planner's size heuristic, that carries the small-scale shape
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hinted = RelationalOps.enrich(facts, dim, "k")
      assert(hasBhj(hinted), "under the bound the dim must broadcast")
      val expect = hinted.collect().sortBy(_.toString).toSeq

      spark.conf.set(conf, "1") // force the above-the-bound branch
      val unhinted = RelationalOps.enrich(facts, dim, "k")
      assert(!hasBhj(unhinted),
        "above the bound the gate must withhold the broadcast hint")
      assert(unhinted.collect().sortBy(_.toString).toSeq == expect,
        "gating is a plan choice, never a result change")
    } finally {
      spark.conf.unset(conf)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("requireBroadcastable: broadcasts under the bound, fails fast above it naming the remedy") {
    val ok = RelationalOps.requireBroadcastable(dim, "test dim", "shrink it")
    assert(ok.join(facts, "k").count() == 5000)
    spark.conf.set(conf, "1")
    try {
      val e = intercept[IllegalArgumentException] {
        RelationalOps.requireBroadcastable(dim, "test dim", "shrink it")
      }
      assert(e.getMessage.contains("spark.graft.broadcastDimBound"))
      assert(e.getMessage.contains("shrink it"))
    } finally spark.conf.unset(conf)
  }

  test("fuzzy short-side gate: editDistancePairs fails loudly when the short side outgrows the bound") {
    // strings must be SHORT (≤ shortMax = q−1+maxDist·q = 5) to
    // populate the window-join side at all — longer strings take the
    // q-gram path and Catalyst folds the empty short filter into a
    // zero-byte LocalRelation that trivially fits any bound
    val strs = (1L to 50L).map(i => (i, s"n${i % 30}")).toDF("id", "s")
    // sanity: works at default bound
    assert(FuzzyOps.editDistancePairs(strs, "id", "s", maxDist = 1).count() >= 0)
    spark.conf.set(conf, "1")
    try {
      val e = intercept[IllegalArgumentException] {
        FuzzyOps.editDistancePairs(strs, "id", "s", maxDist = 1).count()
      }
      assert(e.getMessage.contains("short side"))
    } finally spark.conf.unset(conf)
  }

  test("fuzzy short-side gate measures the SIDE, not the corpus plan stats") {
    // The short side is a Filter over the corpus scan, and Catalyst's
    // size-only visitor gives a Filter its CHILD's sizeInBytes — a
    // stats-based gate would reject any large parquet corpus even
    // when almost nothing is short, and the only "remedy" would be
    // raising the bound. Reproduce the exact shape: a parquet-backed
    // corpus (no constant folding, real scan stats) whose plan
    // estimate exceeds the bound while its short population is a
    // handful of rows — the measured gate must let it through and
    // still pair the short strings.
    val dirp = java.nio.file.Files.createTempDirectory("graft_gate_corpus")
    try {
      // pseudo-random hex bodies: pairwise dissimilar, so the q-gram
      // candidate join stays tiny and the test exercises only the gate
      val long = (1L to 400L).map(i =>
        (i, f"${i * 2654435761L}%016x${i * 1099511628211L}%016x"))
      val short = Seq((9001L, "ab"), (9002L, "ac"), (9003L, "zz"))
      (long ++ short).toDF("id", "s")
        .write.mode("overwrite").parquet(dirp.toString)
      val corpus = spark.read.parquet(dirp.toString)
      val scanEst = corpus.queryExecution.optimizedPlan.stats.sizeInBytes
      // bound BELOW the corpus estimate (the old stats gate would
      // throw) but far above the measured 3-row short side
      val bound = (scanEst / 2).max(BigInt(4096)).toString
      spark.conf.set(conf, bound)
      val pairs = FuzzyOps.editDistancePairs(corpus, "id", "s", maxDist = 1)
        .filter(col("id_a") >= 9000L).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((9001L, 9002L)),
        "short bucket must still resolve under a sub-corpus bound")
    } finally {
      spark.conf.unset(conf)
      val f = dirp.toFile
      Option(f.listFiles()).getOrElse(Array.empty).foreach(_.delete()); f.delete()
    }
  }

  test("size knobs accept Spark-style unit suffixes and name themselves on junk") {
    // 256m parses like Spark's own size confs
    spark.conf.set(conf, "256m")
    try {
      assert(hasBhj(RelationalOps.enrich(facts, dim, "k")))
      spark.conf.set(conf, "tiny")
      val e = intercept[IllegalArgumentException] {
        RelationalOps.enrich(facts, dim, "k")
      }
      assert(e.getMessage.contains(conf) && e.getMessage.contains("256m"),
        "a malformed size knob must name the conf and the accepted format")
    } finally spark.conf.unset(conf)
  }
}
