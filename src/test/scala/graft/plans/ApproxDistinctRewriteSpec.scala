package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxDistinctRewriteSpec extends SparkSpec {
  import spark.implicits._

  // 14000 = lcm(7, 2000): every (group, user) residue pair occurs, so
  // each of the 7 groups has EXACTLY 2000 distinct users.
  private def distinctUsers = {
    val df = (1 to 14000).map(i => (i % 7, i % 2000)).toDF("g", "user")
    df.groupBy("g").agg(countDistinct("user").as("nd"))
  }

  test("off by default: plan keeps the exact distinct aggregate") {
    val plan = distinctUsers.queryExecution.optimizedPlan.toString
    assert(plan.contains("count(distinct"), plan)
    assert(!plan.toLowerCase.contains("hyperloglog"), plan)
    assert(distinctUsers.as[(Int, Long)].collect().forall(_._2 == 2000L))
  }

  test("flag on: COUNT(DISTINCT) rewrites to HLL++ and stays within rsd") {
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val plan = distinctUsers.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("approx_count_distinct") ||
        plan.toLowerCase.contains("hyperloglog"), plan)
      // 2000 distinct per group at rsd=0.05 → ±15% (3σ) check
      distinctUsers.as[(Int, Long)].collect().foreach { case (g, nd) =>
        assert(math.abs(nd - 2000.0) / 2000.0 < 0.15, s"group $g: $nd")
      }
      // SQL surface goes through the same optimizer — raw SQL rewrites too
      val viaSql = {
        (1 to 100).map(i => i % 13).toDF("x").createOrReplaceTempView("adr_t")
        spark.sql("SELECT count(DISTINCT x) AS nd FROM adr_t")
      }
      val sqlPlan = viaSql.queryExecution.optimizedPlan.toString.toLowerCase
      assert(sqlPlan.contains("approx_count_distinct") || sqlPlan.contains("hyperloglog"), sqlPlan)
    } finally spark.conf.set("spark.graft.approxDistinct", "false")
  }

  test("multi-column COUNT(DISTINCT a, b) is left exact (HLL is unary)") {
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val df = Seq((1, 2), (1, 2), (3, 4)).toDF("a", "b")
        .agg(countDistinct($"a", $"b").as("nd"))
      assert(df.queryExecution.optimizedPlan.toString.contains("count(distinct"))
      assert(df.as[Long].head() == 2L)
    } finally spark.conf.set("spark.graft.approxDistinct", "false")
  }
}
