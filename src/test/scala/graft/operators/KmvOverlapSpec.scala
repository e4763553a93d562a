package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.KmvDistinctSketch.{kmvDistinct, kmvSketch, kmvUnionEstimate}

/** Inclusion–exclusion overlap from materialized KMV sketches:
  * est(A) + est(B) − est(A∪B) against a known planted intersection.
  * Each estimate carries ~1/√(k−1) relative error and the subtraction
  * compounds them, so the bound here is deliberately loose (±25% of
  * the true overlap at k=256 — ~4σ).
  */
class KmvOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("estimated overlap tracks the planted intersection") {
    // A = 1..1000, B = 501..1500 → |A∩B| = 500
    val df = ((1 to 1000).map(u => ("a", u.toLong)) ++
      (501 to 1500).map(u => ("b", u.toLong))).toDF("seg", "user")
    val per = df.groupBy("seg")
      .agg(kmvSketch(col("user")).as("sk"), kmvDistinct(col("user")).as("est"))
    val row = per.agg(
      max(when(col("seg") === "a", col("est"))).as("ea"),
      max(when(col("seg") === "b", col("est"))).as("eb"),
      kmvUnionEstimate(col("sk")).as("eu")).head()
    val overlap = row.getLong(0) + row.getLong(1) - row.getLong(2)
    assert(math.abs(overlap - 500.0) <= 125, s"overlap estimate $overlap vs 500")
    // the parts are individually sane too
    // rsd at k=256 is ~6.3%; these are single deterministic draws, so
    // allow ~3σ
    assert(math.abs(row.getLong(0) - 1000.0) <= 200)
    assert(math.abs(row.getLong(2) - 1500.0) <= 300)
  }

  test("disjoint segments estimate ~zero overlap") {
    val df = ((1 to 800).map(u => ("a", u.toLong)) ++
      (10001 to 10800).map(u => ("b", u.toLong))).toDF("seg", "user")
    val per = df.groupBy("seg")
      .agg(kmvSketch(col("user")).as("sk"), kmvDistinct(col("user")).as("est"))
    val row = per.agg(
      max(when(col("seg") === "a", col("est"))).as("ea"),
      max(when(col("seg") === "b", col("est"))).as("eb"),
      kmvUnionEstimate(col("sk")).as("eu")).head()
    val overlap = row.getLong(0) + row.getLong(1) - row.getLong(2)
    // true overlap 0; compounded error at n=1600 scale → allow ±120
    assert(math.abs(overlap.toDouble) <= 120, s"overlap estimate $overlap vs 0")
  }
}
