package graft.operators

import org.apache.spark.sql.functions._

/** IVF-PQ: the coarse-cell and code-compression levers composed.
  *
  * The full-open identity is the load-bearing test: with BOTH levers
  * opened completely (nprobe = nCells → every cell probed, candK = n
  * → every candidate rescored) the composed pipeline must reproduce
  * brute force bit-for-bit — any divergence is an arithmetic or
  * plumbing bug in the composition, since neither approximation is
  * active. Recall at the shipped query config is pinned with margin
  * separately.
  */
class IvfPqSpec extends graft.SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("full-open identity: nprobe=nCells and candK=n reproduce brute force exactly") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val sample = emb.filter(col("vec_id") % SimilarityOps.sampleModulus(n, 16) === 0)
    val ivfpq = SimilarityOps.ivfPqTopK(sample, emb, "vec_id", "embedding",
        dim = 64, m = 4, ksub = 4, nCells = 4, nprobe = 4,
        candK = n.toInt, k = 5)
      .collect().map(_.toString).sorted.toSeq
    val bf = SimilarityOps.bruteForceTopK(sample, emb, "vec_id", "embedding", 5)
      .collect().map(_.toString).sorted.toSeq
    assert(ivfpq == bf, "fully-open IVF-PQ diverged from brute force")
  }

  test("recall >= 0.9 at the query row's config, and replay-deterministic") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val sample = emb.filter(col("vec_id") % SimilarityOps.sampleModulus(n, 64) === 0)
    val exact = SimilarityOps.bruteForceTopK(sample, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
    // the query row's config: measured-knee geometry (2√n cells,
    // half-mass probe — see ivfPqGeometry), √n-scaled candK,
    // cell-count-scaled train sample
    val (nCells, nprobe) = SimilarityOps.ivfPqGeometry(n)
    val candK = math.max(100, math.min(n / 10,
      20L * math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
    val tsMod = SimilarityOps.sampleModulus(n, math.max(512, 32 * nCells))
    def run() = SimilarityOps.ivfPqTopK(sample, emb, "vec_id", "embedding",
      dim = 64, m = 16, ksub = 32, nCells = nCells, nprobe = nprobe,
      candK = candK, k = 5,
      trainSample = if (tsMod <= 1) None
        else Some(emb.filter(col("vec_id") % tsMod === 0)))
    val got = run()
    val stats = exact.join(
        got.select(col("query_id"), col("neighbor_id"), lit(1).as("hit")),
        Seq("query_id", "neighbor_id"), "left")
      .agg(sum(coalesce(col("hit"), lit(0))), count(lit(1))).collect()(0)
    val recall = stats.getLong(0).toDouble / stats.getLong(1)
    // grid-measured 0.93-0.98 at the knee across two decades; the pin
    // leaves margin for neither probe mass nor ADC being perfect
    assert(recall >= 0.9, s"IVF-PQ recall $recall below the pinned 0.9")
    val a = run().collect().map(_.toString).sorted.toSeq
    val b = run().collect().map(_.toString).sorted.toSeq
    assert(a == b, "ivfPqTopK is not replay-deterministic")
  }
}
