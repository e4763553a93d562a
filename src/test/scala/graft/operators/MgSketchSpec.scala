package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import org.apache.spark.sql.graftx.MgHeavyHitters.mgHeavyHitters

/** Misra-Gries guarantees on a planted skewed stream: coverage (every
  * item above the n/(k+1) threshold is reported), counts are lower
  * bounds within n/(k+1) of truth, and both hold under any
  * partitioning (merge order).
  */
class MgSketchSpec extends SparkSpec {
  import spark.implicits._

  private val k = 8
  // 400× hot + 150× warm + 50 tail items × 10 = n = 1050; threshold
  // n/(k+1) ≈ 116.7 → hot and warm MUST be reported
  private val items: Seq[String] =
    Seq.fill(400)("hot") ++ Seq.fill(150)("warm") ++
      (0 until 50).flatMap(i => Seq.fill(10)(s"tail$i"))
  private val shuffled = new scala.util.Random(7).shuffle(items)
  private val truth = Map("hot" -> 400L, "warm" -> 150L)
  private val bound = items.size / (k + 1) // 116

  private def summary(nPartitions: Int): Map[String, Long] =
    shuffled.toDF("token").repartition(nPartitions)
      .agg(mgHeavyHitters(col("token"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.min_count")).as[(String, Long)]
      .collect().toMap

  test("coverage + lower-bound error under single and many-partition merges") {
    for (parts <- Seq(1, 13)) {
      val mg = summary(parts)
      assert(mg.size <= k)
      truth.foreach { case (item, n) =>
        val est = mg.getOrElse(item,
          fail(s"$item (true count $n > $bound) missing at $parts partitions"))
        assert(est <= n, s"$item overcounted: $est > $n")
        assert(est >= n - bound, s"$item undercounted beyond n/(k+1): $est < ${n - bound}")
      }
      // the undisputed heavy hitter ranks first
      assert(mg.maxBy(_._2)._1 == "hot")
    }
  }

  test("exact when distinct keys fit in k counters") {
    val small = Seq("a", "a", "b", "c", "c", "c").toDF("token")
    val mg = small.agg(mgHeavyHitters(col("token"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.min_count")).as[(String, Long)]
      .collect().toMap
    assert(mg == Map("a" -> 2L, "b" -> 1L, "c" -> 3L))
  }
}
