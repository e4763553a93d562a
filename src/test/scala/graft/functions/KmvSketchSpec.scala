package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.KmvDistinctSketch.kmvDistinct
import graft.SparkSpec

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate within error bounds; exact under k distinct") {
    val df = (1 to 100000).map(i => i % 9337).toDF("v").repartition(8)
    val (exact, est) = df
      .agg(countDistinct($"v"), kmvDistinct($"v", k = 512))
      .as[(Long, Long)].head()
    assert(exact == 9337L)
    // std err ≈ 1/sqrt(510) ≈ 4.4%; allow 4 sigma
    assert(math.abs(est - exact).toDouble / exact < 0.18, s"est $est vs $exact")

    // fewer than k distinct → exact count
    val smallExact = (1 to 1000).map(_ % 77).toDF("v").repartition(8)
      .agg(kmvDistinct($"v", k = 512)).as[Long].head()
    assert(smallExact == 77L)
  }

  test("KMV is order/partitioning insensitive (merge correctness)") {
    val data = (1 to 5000).map(i => s"key_${i % 433}")
    val a = data.toDF("v").repartition(1).agg(kmvDistinct($"v", 64)).as[Long].head()
    val b = scala.util.Random.shuffle(data).toDF("v").repartition(13)
      .agg(kmvDistinct($"v", 64)).as[Long].head()
    assert(a == b) // same multiset → same k minimum hashes → same estimate
  }

  test("KMV works per-group") {
    val df = (1 to 10000).map(i => (i % 3, i % (100 * (i % 3 + 1)))).toDF("g", "v")
    val rows = df.groupBy("g").agg(kmvDistinct($"v", 256).as("d"))
      .orderBy("g").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getLong(1) > 0))
  }
}

class KmvSketchAlgebraSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.graftx.KmvDistinctSketch._

  test("per-group sketches unioned == direct global estimate") {
    val df = (1 to 50000).map(i => (i % 7, i % 4211)).toDF("day", "v")
    // the rollup pattern: materialize one sketch per day...
    val perDay = df.groupBy("day").agg(kmvSketch($"v", 256).as("sk"))
    assert(perDay.count() == 7)
    // ...then union sketches at query time (no raw re-scan)
    val viaUnion = perDay.agg(kmvUnionEstimate($"sk", 256)).as[Long].head()
    val direct = df.agg(kmvDistinct($"v", 256)).as[Long].head()
    assert(viaUnion == direct) // identical k-min sets → identical estimate
    val exact = df.select("v").distinct().count()
    assert(math.abs(viaUnion - exact).toDouble / exact < 0.25, s"$viaUnion vs $exact")
  }
}
