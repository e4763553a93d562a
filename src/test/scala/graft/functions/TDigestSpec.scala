package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.TDigest._
import graft.SparkSpec

class TDigestSpec extends SparkSpec {
  import spark.implicits._

  // deterministic scramble: Knuth multiplicative hash orders the values
  // arbitrarily without rand()
  private def scrambled(n: Int): Seq[Double] =
    (1 to n).sortBy(i => i * 2654435761L % n).map(_.toDouble)

  private def rankError(est: Double, sorted: IndexedSeq[Double], q: Double): Double = {
    val rank = sorted.count(_ <= est).toDouble / sorted.size
    math.abs(rank - q)
  }

  test("uniform data: rank error < 1% at body and tail quantiles") {
    val xs = scrambled(20000)
    val sorted = xs.sorted.toIndexedSeq
    val qs = Seq(0.01, 0.1, 0.5, 0.9, 0.99, 0.999)
    val est = xs.toDF("v").repartition(16)
      .agg(tdigestQuantiles($"v", qs, compression = 100).as("qq"))
      .as[Seq[Double]].head()
    qs.zip(est).foreach { case (q, e) =>
      assert(rankError(e, sorted, q) < 0.01, s"q=$q est=$e")
    }
  }

  test("heavy-tailed data: p99/p999 rank error stays small (tail-biased accuracy)") {
    // lognormal-ish via exp of symmetric ramp — deterministic
    val xs = scrambled(20000).map(x => math.exp(x / 2500.0))
    val sorted = xs.sorted.toIndexedSeq
    val qs = Seq(0.5, 0.99, 0.999)
    val est = xs.toDF("v").repartition(16)
      .agg(tdigestQuantiles($"v", qs, 100).as("qq")).as[Seq[Double]].head()
    qs.zip(est).foreach { case (q, e) =>
      assert(rankError(e, sorted, q) < 0.005, s"q=$q est=$e")
    }
  }

  test("partitioning insensitivity: 1-partition vs 32-partition within bound") {
    val xs = scrambled(10000)
    val sorted = xs.sorted.toIndexedSeq
    def run(parts: Int): Seq[Double] = xs.toDF("v").repartition(parts)
      .agg(tdigestQuantiles($"v", Seq(0.1, 0.5, 0.9), 100).as("qq"))
      .as[Seq[Double]].head()
    val (a, b) = (run(1), run(32))
    // t-digest is merge-order dependent — estimates differ, but both
    // must sit within the same rank-error envelope
    Seq(0.1, 0.5, 0.9).zipWithIndex.foreach { case (q, i) =>
      assert(rankError(a(i), sorted, q) < 0.01, s"1p q=$q est=${a(i)}")
      assert(rankError(b(i), sorted, q) < 0.01, s"32p q=$q est=${b(i)}")
    }
  }

  test("exact min/max clamp: q=0 and q=1 return the true extremes") {
    val xs = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    val est = xs.toDF("v")
      .agg(tdigestQuantiles($"v", Seq(0.0, 1.0), 50).as("qq")).as[Seq[Double]].head()
    assert(est == Seq(1.0, 9.0))
  }

  test("constant column: every quantile is the constant") {
    val est = Seq.fill(1000)(42.5).toDF("v").repartition(8)
      .agg(tdigestQuantiles($"v", Seq(0.01, 0.5, 0.99), 100).as("qq"))
      .as[Seq[Double]].head()
    assert(est == Seq(42.5, 42.5, 42.5))
  }

  test("mixed-sign values: median of symmetric data ≈ 0, extremes exact") {
    val xs = scrambled(5001).map(_ - 2501.0) // -2500..2500 symmetric
    val est = xs.toDF("v").repartition(8)
      .agg(tdigestQuantiles($"v", Seq(0.0, 0.5, 1.0), 100).as("qq"))
      .as[Seq[Double]].head()
    assert(est.head == -2500.0 && est(2) == 2500.0)
    assert(math.abs(est(1)) <= 25.0, s"median ${est(1)}")
  }

  test("per-group digests; null input ignored; empty group absent") {
    val df = (1 to 3000).map(i => (i % 3, if (i % 17 == 0) None else Some(i.toDouble)))
      .toDF("g", "v")
    val rows = df.groupBy("g")
      .agg(tdigestQuantiles($"v", Seq(0.5), 100).as("qq"))
      .orderBy("g").as[(Int, Seq[Double])].collect()
    assert(rows.length == 3)
    rows.foreach { case (_, qq) => assert(qq.head > 1000 && qq.head < 2000) }
  }
}

class TDigestWeightedSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.graftx.TDigest._

  test("weighted quantiles == quantiles of the weight-expanded multiset") {
    // value i with weight (i % 5 + 1); expansion stays exact-checkable
    val rows = (1 to 2000).sortBy(i => i * 2654435761L % 2000)
      .map(i => (i.toDouble, (i % 5 + 1).toLong))
    val expanded = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }
      .sorted.toIndexedSeq
    val qs = Seq(0.1, 0.5, 0.99)
    val est = rows.toDF("v", "w").repartition(16)
      .agg(tdigestWeightedQuantiles($"v", $"w", qs, 100).as("qq"))
      .as[Seq[Double]].head()
    qs.zip(est).foreach { case (q, e) =>
      val rank = expanded.count(_ <= e).toDouble / expanded.size
      assert(math.abs(rank - q) < 0.01, s"q=$q est=$e rank=$rank")
    }
  }

  test("all-ones weights == unweighted; zero/null weights ignored") {
    val vals = (1 to 1000).map(_.toDouble)
    val uw = vals.toDF("v")
      .agg(tdigestQuantiles($"v", Seq(0.5), 100)).as[Seq[Double]].head()
    val w1 = vals.map((_, Some(1L)))
      .toDF("v", "w")
      .agg(tdigestWeightedQuantiles($"v", $"w", Seq(0.5), 100))
      .as[Seq[Double]].head()
    assert(uw == w1) // identical insertion stream → identical digest
    // rows with weight 0 / null contribute nothing
    val spiked = (vals.map((_, Some(1L))) ++
        Seq((1.0e9, Some(0L)), (-1.0e9, Option.empty[Long])))
      .toDF("v", "w")
      .agg(tdigestWeightedQuantiles($"v", $"w", Seq(0.0, 1.0), 100))
      .as[Seq[Double]].head()
    assert(spiked == Seq(1.0, 1000.0))
  }
}

class TDigestAlgebraSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.graftx.TDigest._

  test("per-shard digests unioned ≈ direct digest ≈ exact (the rollup pattern)") {
    val xs = (1 to 40000).sortBy(i => i * 2654435761L % 40000)
      .map(i => (i % 8, i.toDouble))
    val df = xs.toDF("shard", "v").repartition(16)
    val perShard = df.groupBy("shard").agg(tdigestSketch($"v", 100).as("dig"))
    assert(perShard.count() == 8)
    val union = perShard
      .agg(tdigestUnionQuantiles($"dig", Seq(0.5, 0.99), 100).as("qq"))
      .as[Seq[Double]].head()
    val sorted = xs.map(_._2).sorted.toIndexedSeq
    Seq(0.5, 0.99).zip(union).foreach { case (q, e) =>
      val rank = sorted.count(_ <= e).toDouble / sorted.size
      assert(math.abs(rank - q) < 0.01, s"q=$q est=$e rank=$rank")
    }
  }
}
