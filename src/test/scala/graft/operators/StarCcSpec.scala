package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[RelationalOps.connectedComponentsStar]] must produce EXACTLY the
  * labels of min-label [[RelationalOps.connectedComponents]] (every
  * node → smallest reachable id) — on the shapes that distinguish the
  * two algorithms: long chains (min-label's O(diameter) worst case,
  * star's O(log n) showcase), cluster merges, random sparse graphs,
  * and singleton-heavy node sets.
  */
class StarCcSpec extends SparkSpec {
  import spark.implicits._

  private def labels(nodes: DataFrame, pairs: DataFrame,
                     star: Boolean, smallGraphEdges: Long = 200000L): Map[Long, Long] = {
    val cc =
      if (star) RelationalOps.connectedComponentsStar(nodes, "id", pairs, "a", "b",
        smallGraphEdges = smallGraphEdges)
      // maxIter high enough that min-label always converges here —
      // the comparison needs its FIXED POINT, not its capped output
      else RelationalOps.connectedComponents(nodes, "id", pairs, "a", "b",
        maxIter = 200, smallGraphEdges = smallGraphEdges)
    cc.select(col("id"), col("cluster_id").cast("long"))
      .as[(Long, Long)].collect().toMap
  }

  private def check(nodeIds: Seq[Long], pairSeq: Seq[(Long, Long)]): Unit = {
    val nodes = nodeIds.toDF("id")
    val pairs = pairSeq.toDF("a", "b")
    // all four strategies must agree: local union-find (the adaptive
    // small-graph path both entry points share), the distributed
    // min-label loop, and DISTRIBUTED star contraction (both
    // distributed loops forced by zeroing the threshold)
    val smallPath = labels(nodes, pairs, star = false)
    val distributed = labels(nodes, pairs, star = false, smallGraphEdges = 0L)
    val starSmall = labels(nodes, pairs, star = true)
    val starDist = labels(nodes, pairs, star = true, smallGraphEdges = 0L)
    assert(smallPath == distributed,
      s"union-find vs distributed diff=${(smallPath.toSet diff distributed.toSet).take(5)}")
    assert(starSmall == distributed,
      s"star small-path diff=${(starSmall.toSet diff distributed.toSet).take(5)}")
    assert(starDist == distributed,
      s"star diff=${(starDist.toSet diff distributed.toSet).take(5)} / ${(distributed.toSet diff starDist.toSet).take(5)}")
  }

  test("long chain: one 60-hop component resolves to its minimum") {
    // min-label at its DEFAULT maxIter=20 mislabels this chain (one
    // hop per round — caught by this spec, now warned about in the
    // operator); star contracts it in O(log n) rounds
    check((0L to 60L), (0L until 60L).map(i => (i, i + 1)))
  }

  test("two chains merged by a bridge edge") {
    val chainA = (0L until 20L).map(i => (i, i + 1))
    val chainB = (100L until 120L).map(i => (i, i + 1))
    check((0L to 20L) ++ (100L to 120L), chainA ++ chainB :+ (20L, 100L))
  }

  test("random sparse graph + singletons") {
    val rnd = new scala.util.Random(7)
    val pairs = (0 until 300).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    check((0L until 250L), pairs) // 200 touched + 50 singletons
  }

  test("empty pair set: every node is its own cluster") {
    check((0L until 10L), Seq.empty)
  }

  test("star converges within the round budget on a 500-hop chain") {
    // the shape that breaks O(diameter) algorithms outright: star must
    // finish (and be right) in <= maxIter rounds
    val n = 500L
    val nodes = (0L to n).toDF("id")
    val pairs = (0L until n).map(i => (i, i + 1)).toDF("a", "b")
    val out = RelationalOps.connectedComponentsStar(nodes, "id", pairs, "a", "b")
      .select(col("cluster_id").cast("long")).distinct().as[Long].collect()
    assert(out.toSeq == Seq(0L), s"one component labeled 0, got ${out.toSeq}")
  }
}
