package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** AQE skew handling — the runtime answer to hot keys at 100 TB. With
  * the skew thresholds lowered to test scale, a 95%-one-key join must
  * get its skewed partition split by AdaptiveSparkPlan (the plan marks
  * the sort-merge join `skew=true`).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      val facts = (1 to 200000)
        .map(i => (if (i % 20 != 0) 1L else i.toLong, s"payload_$i"))
        .toDF("k", "v") // 95% of rows share k=1
      val dim = (1L to 200000L by 17).map(k => (k, s"d$k")).toDF("k", "d")
      // no key-preserving operator above the join: requiring the join's
      // output partitioning (e.g. groupBy("k")) legally disables the
      // skew split, since splitting would break that distribution
      val joined = facts.join(dim, "k").select(length(col("v")).as("l"))
      // drive THIS DataFrame's QueryExecution (write/count would plan
      // their own), so executedPlan below is the final adaptive plan
      assert(joined.collect().nonEmpty)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE coalesces undersized shuffle partitions") {
    // the flip side of skew handling: a 32-way shuffle of a tiny
    // aggregation must NOT schedule 32 near-empty reducers — AQE
    // merges them to the advisory size at runtime. At 100 TB the same
    // mechanism right-sizes every intermediate stage without
    // hand-tuning spark.sql.shuffle.partitions per query.
    val conf = spark.conf
    val saved = conf.get("spark.sql.shuffle.partitions")
    try {
      conf.set("spark.sql.shuffle.partitions", "32")
      val agg = (1 to 1000).map(i => (i % 10, i.toLong)).toDF("k", "v")
        .groupBy("k").agg(sum("v").as("s"))
      assert(agg.collect().length == 10)
      // the adaptive plan hides its final physical tree from TreeNode
      // collect — assert on the rendered final plan instead
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead coalesced"),
        s"expected coalesced shuffle read in:\n$plan")
    } finally conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("saltedJoin spreads a hot key over salts reducers with identical rows") {
    val facts = (1 to 5000)
      .map(i => (if (i % 10 != 0) 1L else i.toLong, i.toLong))
      .toDF("k", "v") // 90% of rows share k=1
    val dim = (1L to 5000L).map(k => (k, s"d$k")).toDF("k", "d")

    val salted = RelationalOps.saltedJoin(facts, dim, "k", salts = 8)
    val plain = facts.join(dim, "k")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // the exchange must be keyed on (k, __salt), not k alone
    salted.collect()
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt must reach the join keys:\n$plan")
  }
}
