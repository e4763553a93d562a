package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Branch parity for the QUERY-side broadcast gates in the PQ/IVF-PQ
  * family (the `LshVerifyBranchSpec` pattern): ordinary runs only ever
  * exercise the broadcast branch (query batches are small), so without
  * these pins the shuffle/chunked fallbacks — the branches that
  * actually run when a corpus-shaped batch hits the index at the
  * 100 TB tier — could silently diverge. Each test forces the fallback
  * by conf'ing `spark.graft.ann.queryBroadcastBound` down, asserts the
  * plan genuinely changed shape, and asserts (query_id, rank,
  * neighbor_id, cos) equality with the broadcast branch — the cos
  * column included: scoring arithmetic must agree exactly, not just
  * the surviving ids.
  */
class PqBroadcastGateSpec extends graft.SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val boundConf = "spark.graft.ann.queryBroadcastBound"

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.select("query_id", "rank", "neighbor_id", "cos")
      .as[(Long, Long, Long, Double)].collect().toSet

  private def withBound[T](v: String)(body: => T): T =
    try { spark.conf.set(boundConf, v); body }
    finally spark.conf.unset(boundConf)

  test("ivfPqTopK: broadcast and shuffle-fallback branches are bit-identical") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val sample = emb.filter(col("vec_id") % SimilarityOps.sampleModulus(n, 16) === 0)
    def mine() = SimilarityOps.ivfPqTopK(sample, emb, "vec_id", "embedding",
      dim = 64, m = 8, ksub = 16, nCells = 4, nprobe = 2, candK = 100, k = 5)
    val viaBroadcast = mine()
    // 1 byte: every query-side estimate exceeds it, so the cell-equi
    // candidate join AND the rescore query join lose their hints (the
    // corpus-side gates are untouched — they read broadcastDimBound)
    val viaShuffle = withBound("1")(mine())
    assert(viaBroadcast.queryExecution.optimizedPlan.toString !=
      viaShuffle.queryExecution.optimizedPlan.toString,
      "bound conf did not change the candidate/rescore join shape")
    // the fallback must not degenerate into a cartesian over the codes
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    assert(viaShuffle.queryExecution.executedPlan.collect {
      case c: CartesianProductExec => c
    }.isEmpty, "shuffle fallback planned a cartesian product")
    assert(rows(withBound("1")(mine())) == rows(viaBroadcast))
  }

  test("pqTopKEncoded: single-broadcast and chunked-broadcast branches are bit-identical") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val sample = emb.filter(col("vec_id") % SimilarityOps.sampleModulus(n, 16) === 0)
    val (dim, m, ksub) = (64, 8, 16)
    val cb = SimilarityOps.trainPq(emb, "vec_id", "embedding", dim, m, ksub, iters = 2)
    val enc = SimilarityOps.pqEncode(emb, "vec_id", "embedding", dim, m, cb)
    def mine() = SimilarityOps.pqTopKEncoded(sample, emb, "vec_id", "embedding",
      dim, m, ksub, cb, enc, candK = 100, k = 5)
    val whole = mine()
    // a bound of one query-table's bytes forces 2+ hash chunks while
    // staying far under the maxQueryChunks fail-fast
    val oneTab = m.toLong * ksub * 8 + 96
    val chunked = withBound((oneTab * 4).toString)(mine())
    assert(whole.queryExecution.optimizedPlan.toString !=
      chunked.queryExecution.optimizedPlan.toString,
      "bound conf did not change the ADC-scan shape")
    assert(rows(withBound((oneTab * 4).toString)(mine())) == rows(whole))
  }

  test("candidate top-k: heap and window-fallback branches are bit-identical") {
    // the third query-side gate: the candidate heap lives outside
    // Spark's execution memory, so past spark.graft.topk.heapBound the
    // scorer falls back to the spillable window-rank path. Forcing the
    // bound to 1 byte must swap TopKPerGroup for Window in the plan
    // and change NOTHING about the selected rows.
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val sample = emb.filter(col("vec_id") % SimilarityOps.sampleModulus(n, 16) === 0)
    def mine() = SimilarityOps.ivfPqTopK(sample, emb, "vec_id", "embedding",
      dim = 64, m = 8, ksub = 16, nCells = 4, nprobe = 2, candK = 100, k = 5)
    val viaHeap = mine()
    val heapBound = "spark.graft.topk.heapBound"
    def withHeapBound[T](v: String)(body: => T): T =
      try { spark.conf.set(heapBound, v); body }
      finally spark.conf.unset(heapBound)
    val viaWindow = withHeapBound("1")(mine())
    def planOf(df: DataFrame) = df.queryExecution.executedPlan.toString
    assert(planOf(viaHeap).contains("TopKPerGroup") &&
      !planOf(viaHeap).contains("RunningWindowFunction"),
      "default branch did not plan the heap operator")
    assert(!planOf(viaWindow).contains("TopKPerGroup"),
      "1-byte bound did not force the window fallback")
    assert(rows(withHeapBound("1")(mine())) == rows(viaHeap))
  }

  test("pqTopKEncoded: a corpus-shaped query batch fails fast with the IVF remedy") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val sample = emb.filter(col("vec_id") % SimilarityOps.sampleModulus(n, 16) === 0)
    val (dim, m, ksub) = (64, 4, 4)
    val cb = SimilarityOps.trainPq(emb, "vec_id", "embedding", dim, m, ksub, iters = 1)
    val enc = SimilarityOps.pqEncode(emb, "vec_id", "embedding", dim, m, cb)
    val e = intercept[IllegalArgumentException] {
      withBound("1")(SimilarityOps.pqTopKEncoded(sample, emb, "vec_id", "embedding",
        dim, m, ksub, cb, enc, candK = 100, k = 5))
    }
    assert(e.getMessage.contains("maxQueryChunks") &&
      e.getMessage.contains("ivfPqTopK"), e.getMessage)
  }
}
