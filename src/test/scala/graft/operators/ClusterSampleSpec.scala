package graft.operators

import org.apache.spark.sql.functions._

/** Cluster-balanced sampling: quota per IVF cell, content-hash order,
  * no rand(). Pins the three contract legs the `tx_cluster_sample`
  * row's invariants rest on: (1) replay determinism — two independent
  * runs select the SAME ids with the same (cell, rn); (2) quota is a
  * CAP, not a pad — a cell with fewer members than quota contributes
  * all of them and nothing else; (3) balance — on a fixture whose
  * density is wildly skewed across two planted clusters, the sample
  * still takes quota from EACH cluster (the flatten-the-dense-mode
  * property that uniform sampling lacks).
  */
class ClusterSampleSpec extends graft.SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("replayable: two runs select identical (id, cell, rn)") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    def run() = SimilarityOps
      .clusterBalancedSample(emb, "vec_id", "embedding", nCells = 4, quota = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(run() == run(), "cluster sample is not replay-deterministic")
  }

  test("quota caps, never pads: a sub-quota cell yields all its members") {
    // two planted orthogonal directions, 30 vs 3 members — with
    // nCells=2 the Lloyd cells split on the direction, so the small
    // cell has fewer members than quota=8
    def vec(axis: Int, i: Int): Seq[Float] =
      (0 until 8).map(d => if (d == axis) 1f else i * 1e-4f)
    val rows = (0 until 30).map(i => (i.toLong, vec(0, i))) ++
      (100 until 103).map(i => (i.toLong, vec(4, i)))
    val df = rows.toDF("vec_id", "embedding")
    val taken = SimilarityOps
      .clusterBalancedSample(df, "vec_id", "embedding", nCells = 2, quota = 8)
      .collect()
    val byCell = taken.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    assert(byCell.size == 2, s"expected 2 populated cells, got $byCell")
    assert(byCell.values.toSeq.sorted == Seq(3, 8),
      s"expected quota cap 8 and full small cell 3, got $byCell")
    // the 3 small-cluster ids must ALL be in the sample (cap ≠ drop)
    val smallIds = taken.map(_.getLong(0)).filter(_ >= 100).sorted.toSeq
    assert(smallIds == Seq(100L, 101L, 102L))
  }

  test("balance: a 10:1 density skew still yields quota per cluster") {
    def vec(axis: Int, i: Int): Seq[Float] =
      (0 until 8).map(d => if (d == axis) 1f else i * 1e-4f)
    val rows = (0 until 200).map(i => (i.toLong, vec(0, i))) ++
      (1000 until 1020).map(i => (i.toLong, vec(4, i)))
    val df = rows.toDF("vec_id", "embedding")
    val taken = SimilarityOps
      .clusterBalancedSample(df, "vec_id", "embedding", nCells = 2, quota = 10)
      .collect()
    val byCell = taken.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    assert(byCell.values.forall(_ == 10),
      s"dense mode over/under-represented: $byCell")
    // uniform sampling at the same size (20 of 220) would give the
    // sparse cluster ~1.8 expected members; balance gives it 10
    val sparseTaken = taken.map(_.getLong(0)).count(_ >= 1000)
    assert(sparseTaken == 10)
  }
}
