package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.BottomKByKey.bottomK
import graft.SparkSpec

class BottomKSampleSpec extends SparkSpec {
  import spark.implicits._

  private def hk = md5(col("id").cast("string").cast("binary"))

  test("bottom-k agg == row_number window form, any partitioning") {
    val df = (1L to 5000L).map(i => (i, s"g${i % 7}")).toDF("id", "g")
    val win = df.withColumn("h", hk)
      .withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("h")))
      .filter($"rn" <= 10)
      .groupBy("g").agg(sort_array(collect_list(struct($"h", $"id"))).as("s"))
      .select($"g", expr("transform(s, x -> x.id)").as("ids"))
      .as[(String, Seq[Long])].collect().toMap

    for (nPart <- Seq(1, 3, 32)) {
      val agg = df.repartition(nPart)
        .groupBy("g").agg(bottomK(hk, $"id", 10).as("ids"))
        .as[(String, Seq[Long])].collect().toMap
      assert(agg == win, s"partitioning $nPart diverged")
    }
  }

  test("groups smaller than k return all rows; nulls skipped") {
    val df = Seq((Some(1L), "a"), (Some(2L), "a"), (None, "a"))
      .toDF("id", "g")
    val got = df.groupBy("g").agg(bottomK(hk, $"id", 10).as("ids"))
      .as[(String, Seq[Long])].collect().head._2
    assert(got.toSet == Set(1L, 2L))
  }

  test("sample is uniform-ish: 500-of-5000 hits every decile") {
    val df = (1L to 5000L).map(i => (i, "g")).toDF("id", "g")
    val ids = df.groupBy("g").agg(bottomK(hk, $"id", 500).as("ids"))
      .as[(String, Seq[Long])].collect().head._2
    assert(ids.size == 500)
    val byDecile = ids.groupBy(i => (i - 1) / 500).view.mapValues(_.size)
    // expectation 50 per decile; a deterministic hash either passes
    // forever or fails forever, so the loose band is safe
    byDecile.foreach { case (d, n) => assert(n > 20 && n < 100, s"decile $d: $n") }
  }
}
