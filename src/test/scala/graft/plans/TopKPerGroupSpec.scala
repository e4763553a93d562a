package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.GraftPlans

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private def sample = (1 to 1000)
    .map(i => (i.toLong, s"g${i % 7}", (i * 37 % 501).toDouble))
    .toDF("id", "grp", "v")

  test("matches the window row_number formulation exactly") {
    val df = sample
    val got = GraftPlans.topKPerGroup(df,
      Seq("grp"), Seq("v" -> false, "id" -> true), k = 5)
      .select("id", "grp", "v").as[(Long, String, Double)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("grp").orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("id", "grp", "v").as[(Long, String, Double)].collect().toSet
    assert(got == want)
  }

  test("plan is the two-stage heap exec with one exchange and NO sort") {
    val df = sample
    val plan = GraftPlans.topKPerGroup(df,
      Seq("grp"), Seq("v" -> false, "id" -> true), k = 3)
      .queryExecution.executedPlan.toString
    // physical nodeName strips the Exec suffix; partial + final stages
    assert("TopKPerGroup".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Exchange"), plan)
    assert(!plan.contains("Sort "), plan) // the point: no sort anywhere
    assert(!plan.contains("Window"), plan)
  }

  test("groups smaller than k emit all their rows; k=1 is per-group argmax") {
    val df = Seq((1L, "a", 5.0), (2L, "a", 7.0), (3L, "b", 1.0)).toDF("id", "grp", "v")
    val top1 = GraftPlans.topKPerGroup(df, Seq("grp"), Seq("v" -> false, "id" -> true), 1)
      .select("id").as[Long].collect().toSet
    assert(top1 == Set(2L, 3L))
    val top9 = GraftPlans.topKPerGroup(df, Seq("grp"), Seq("v" -> false, "id" -> true), 9)
    assert(top9.count() == 3)
  }

  test("ties break deterministically through the total order") {
    val df = Seq((1L, "a", 5.0), (2L, "a", 5.0), (3L, "a", 5.0)).toDF("id", "grp", "v")
    val got = GraftPlans.topKPerGroup(df, Seq("grp"), Seq("v" -> false, "id" -> true), 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // lowest ids win the tie
  }
}
