package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min-Sketch guarantees: never underestimates, overestimate
  * bounded by eps·N with probability `confidence` — checked against
  * exact counts, including the string path (the SQL aggregate hashes
  * UTF8 bytes; the driver-side probe must agree).
  */
class CmsFreqSpec extends SparkSpec {
  import spark.implicits._

  test("estimates are >= exact and within eps*N; string probes line up") {
    val n = 10000
    val df = (1 to n).map(i => s"k${i % 50}").toDF("k")
    val exact = df.groupBy("k").count().as[(String, Long)].collect().toMap
    val eps = 0.01
    val bytes = df.select(count_min_sketch(col("k"), lit(eps), lit(0.99), lit(7)).as("sk"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"$k underestimated: $est < $c")
      assert(est <= c + (eps * n).toLong, s"$k overestimated: $est vs $c")
    }
    // absent key: bounded by eps*N too
    assert(cms.estimateCount("never-seen") <= (eps * n).toLong)
  }

  test("sketches merge: union of two halves == sketch of the whole (same seed)") {
    val a = (1 to 500).map(i => s"k${i % 20}").toDF("k")
    val b = (501 to 1000).map(i => s"k${i % 20}").toDF("k")
    def sketch(df: org.apache.spark.sql.DataFrame) =
      org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(
          df.select(count_min_sketch(col("k"), lit(0.01), lit(0.99), lit(7)).as("s"))
            .head.getAs[Array[Byte]](0)))
    val merged = sketch(a).mergeInPlace(sketch(b))
    val whole = sketch(a.union(b))
    (0 until 20).foreach { i =>
      assert(merged.estimateCount(s"k$i") == whole.estimateCount(s"k$i"))
    }
  }
}
