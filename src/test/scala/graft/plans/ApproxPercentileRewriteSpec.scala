package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxPercentileRewriteSpec extends SparkSpec {
  import spark.implicits._

  // 7 groups × values 1..2000 each → every group's exact p50 = 1000.5
  private def groupP50 = {
    val df = (0 until 14000).map(i => (i % 7, (i / 7 % 2000 + 1).toDouble)).toDF("g", "v")
    df.groupBy("g").agg(expr("percentile(v, 0.5)").as("p50"))
  }

  test("off by default: plan keeps the exact percentile") {
    val plan = groupP50.queryExecution.optimizedPlan.toString.toLowerCase
    assert(plan.contains("percentile"), plan)
    assert(!plan.contains("tdigest"), plan)
    assert(groupP50.as[(Int, Double)].collect().forall(_._2 == 1000.5))
  }

  test("flag on: scalar, array, and weighted percentile forms all rewrite") {
    spark.conf.set("spark.graft.approxPercentile", "true")
    try {
      // scalar percentage → element_at(tdigest, 1), stays DOUBLE
      val plan = groupP50.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("tdigest"), plan)
      groupP50.as[(Int, Double)].collect().foreach { case (g, p50) =>
        assert(math.abs(p50 - 1000.5) / 1000.5 < 0.02, s"group $g: $p50")
      }
      // array percentages keep the array shape; raw SQL goes through
      // the same optimizer
      (1 to 1000).map(_.toDouble).toDF("v").createOrReplaceTempView("apr_t")
      val arr = spark.sql("SELECT percentile(v, array(0.1, 0.9)) AS qs FROM apr_t")
      assert(arr.queryExecution.optimizedPlan.toString.toLowerCase.contains("tdigest"))
      val qs = arr.as[Seq[Double]].head()
      assert(math.abs(qs.head - 100.0) < 25 && math.abs(qs(1) - 900.0) < 25, qs.toString)
      // frequency argument → weighted digest
      val wtd = spark.sql(
        "SELECT percentile(v, 0.5, CAST(v AS BIGINT)) AS wp50 FROM apr_t")
      val wplan = wtd.queryExecution.optimizedPlan.toString.toLowerCase
      assert(wplan.contains("tdigest_weighted"), wplan)
      // weight ∝ value ⇒ weighted median = v where cum v(v+1)/2 hits half
      // of 1000·1001/2 → ~707
      val wp50 = wtd.as[Double].head()
      assert(math.abs(wp50 - 707.0) < 25, wp50.toString)
    } finally spark.conf.set("spark.graft.approxPercentile", "false")
  }

  test("DISTINCT percentile is left exact (digest is multiset-semantic)") {
    spark.conf.set("spark.graft.approxPercentile", "true")
    try {
      val df = Seq(1.0, 1.0, 1.0, 2.0, 3.0).toDF("v")
        .agg(expr("percentile(DISTINCT v, 0.5)").as("p"))
      assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("tdigest"))
      assert(df.as[Double].head() == 2.0)
    } finally spark.conf.set("spark.graft.approxPercentile", "false")
  }
}
