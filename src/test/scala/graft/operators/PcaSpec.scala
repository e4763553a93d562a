package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SimilarityOps.pcaBasis / pcaProject: the distributed Gramian + driver
  * eigen-solve must behave like PCA — full basis preserves all variance,
  * a dominant planted direction is found by the first component, and the
  * result is invariant to input partitioning (the treeAggregate reduce
  * is exact, so partition count must not change the basis).
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val d = 16

  /** n vectors with a planted dominant direction e0·scale + small noise
    * in the remaining dims (deterministic hash-based pseudo-noise).
    */
  private def planted(n: Int, scale: Double) = {
    def h(i: Int, j: Int): Double = {
      val x = (i * 2654435761L + j * 40503L) & 0xffff
      (x.toDouble / 0xffff - 0.5)
    }
    (0 until n).map { i =>
      val v = Array.tabulate(d)(j => (0.2 * h(i, j)).toFloat)
      v(0) = (v(0) + scale * h(i, 999)).toFloat
      (i.toLong, v.toSeq)
    }.toDF("id", "vec")
      .withColumn("vec", col("vec").cast("array<float>"))
  }

  private def totalVar(df: org.apache.spark.sql.DataFrame, vecCol: String): Double =
    df.select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy("i").agg(var_pop(col("x").cast("double")).as("v"))
      .agg(sum("v")).head.getDouble(0)

  private def projVar(proj: org.apache.spark.sql.DataFrame): Double =
    proj.select(posexplode(col("proj")).as(Seq("j", "p")))
      .groupBy("j").agg(var_pop(col("p")).as("v"))
      .agg(sum("v")).head.getDouble(0)

  test("full basis (k=d) preserves total variance") {
    val df = planted(200, 3.0)
    val (basis, ev) = SimilarityOps.pcaBasis(df, "vec", d)
    assert(basis.length == d && basis.head.length == d)
    assert(math.abs(ev.sum - 1.0) < 1e-6) // fractions sum to 1 at k=d
    val tv = totalVar(df, "vec")
    val pv = projVar(SimilarityOps.pcaProject(df, "id", "vec", basis))
    // orthonormal rotation: variance is exactly conserved (fp tolerance)
    assert(math.abs(pv - tv) / tv < 1e-9, s"pv=$pv tv=$tv")
  }

  test("k=1 captures the planted dominant direction") {
    val df = planted(200, 3.0)
    val (basis, ev) = SimilarityOps.pcaBasis(df, "vec", 1)
    // the planted axis dominates: e0 coefficient near ±1
    assert(math.abs(math.abs(basis.head.head) - 1.0) < 0.05,
      s"pc1=${basis.head.take(4).toSeq}")
    assert(ev.head > 0.7, s"explained=${ev.head}")
    val pv = projVar(SimilarityOps.pcaProject(df, "id", "vec", basis))
    val tv = totalVar(df, "vec")
    assert(pv / tv > 0.7)
  }

  test("pcaTopK: high recall vs brute force on clustered geometry") {
    // 4 well-separated cluster directions + small noise: the regime
    // PCA pruning is built for (few directions hold the variance)
    def h(i: Int, j: Int): Double = {
      val x = (i * 2654435761L + j * 40503L) & 0xffff
      x.toDouble / 0xffff - 0.5
    }
    val centers = Array.tabulate(4, d)((c, j) =>
      if (j == c * 2) 3.0 else 0.0)
    val df = (0 until 160).map { i =>
      val ctr = centers(i % 4)
      (i.toLong, Array.tabulate(d)(j => (ctr(j) + 0.3 * h(i, j)).toFloat).toSeq)
    }.toDF("id", "vec").withColumn("vec", col("vec").cast("array<float>"))
    val (basis, _) = SimilarityOps.pcaBasis(df, "vec", 4)
    val approx = SimilarityOps.pcaTopK(df, df, "id", "vec", basis,
        candidates = 20, k = 5)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    val exact = SimilarityOps.bruteForceTopK(df, df, "id", "vec", k = 5)
      .select("query_id", "neighbor_id")
    val (n, hits) = {
      val r = exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)), sum(coalesce(col("hit"), lit(0)))).head
      (r.getLong(0), r.getLong(1))
    }
    assert(hits.toDouble / n >= 0.95, s"recall=${hits.toDouble / n}")
  }

  test("basis is partitioning-invariant (exact Gramian reduce)") {
    val df = planted(300, 2.0)
    val (b1, _) = SimilarityOps.pcaBasis(df.repartition(1), "vec", 3)
    val (b7, _) = SimilarityOps.pcaBasis(df.repartition(7), "vec", 3)
    // eigenvectors are sign-ambiguous; compare |dot| per component ≈ 1
    b1.zip(b7).foreach { case (u, v) =>
      val dot = u.zip(v).map { case (a, b) => a * b }.sum
      assert(math.abs(math.abs(dot) - 1.0) < 1e-6, s"|dot|=${math.abs(dot)}")
    }
  }
}
