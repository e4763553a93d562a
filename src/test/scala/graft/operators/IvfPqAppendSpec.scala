package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental IVF-PQ maintenance ([[SimilarityOps.ivfPqAppend]]):
  * the frozen index structures (coarse cents + PQ codebooks) make
  * assign/encode pure per-row functions, so appending a delta must be
  * BIT-IDENTICAL to having encoded those rows at build time — no
  * "approximately equal", no tolerance. Two parity axes:
  *
  *  - CODE parity: append(base-built index, delta) row-set ==
  *    build-time encode of the full corpus against the SAME frozen
  *    structures (cell, every code, and the stored norm all equal).
  *  - SEARCH parity: ivfPqSearch over the appended code index ==
  *    the same search over the build-time-encoded index (same
  *    cents/codebook/params), row for row.
  *
  * Plus the lifecycle boundary: appended ids are searchable (a query
  * that IS a delta vector finds itself rank 1 at cos 1.0 — it can
  * only arrive via the appended codes).
  */
class IvfPqAppendSpec extends graft.SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val (dim, m, ksub) = (64, 8, 16)

  private lazy val emb = graft.Tables.load(spark, sf, "embeddings")
  private lazy val base = emb.filter(col("vec_id") % 10 =!= 0)
  private lazy val delta = emb.filter(col("vec_id") % 10 === 0)

  // one base-trained index shared by all three tests — the SAMPLE-
  // trained branch, the production build shape and the one whose
  // stored cells are exactly ivfAssign-vs-the-returned-cents (the
  // trainSample=None convenience branch reuses trainIvf's final
  // assignment, which lags the returned centroids by one Lloyd step —
  // see ivfPqAppend's scaladoc — so strict append parity is a
  // sample-trained contract)
  private lazy val built: (DataFrame, DataFrame, DataFrame) = {
    val (cents, codebook, codes) = SimilarityOps.buildIvfPq(
      base, "vec_id", "embedding", dim, m, ksub, nCells = 8,
      trainSample = Some(base.filter(col("vec_id") % 3 === 0)))
    (cents.localCheckpoint(), codebook.localCheckpoint(),
      codes.localCheckpoint())
  }

  private def key(r: org.apache.spark.sql.Row): (Long, Int, Seq[Int], Double) =
    (r.getLong(0), r.getInt(1), r.getSeq[Int](2), r.getDouble(3))

  test("code parity: append == build-time encode against the same frozen structures") {
    val (cents, codebook, baseCodes) = built
    val appended = SimilarityOps.ivfPqAppend(delta, "vec_id", "embedding",
      dim, m, cents, codebook, baseCodes)
      .select(col("neighbor_id"), col("cell").cast("int"), col("codes"), col("cn"))

    // the reference: encode the FULL corpus against the same frozen
    // cents/codebook — exactly what buildIvfPq would have produced
    // had the delta been present at build time (training is on the
    // structures' own inputs, which have not changed)
    val assigned = SimilarityOps.ivfAssign(emb, "vec_id", "embedding", cents)
      .select(col("id").as("neighbor_id"), col("assigned_cell").cast("int").as("cell"))
    val full = SimilarityOps.pqEncode(emb, "vec_id", "embedding", dim, m, codebook)
      .select(col("id").as("neighbor_id"), col("codes"))
      .join(assigned, "neighbor_id")
      .join(emb.select(col("vec_id").as("neighbor_id"),
        org.apache.spark.sql.graftx.GraftFunctions.vecNorm(
          col("embedding")).as("cn")), "neighbor_id")
      .select(col("neighbor_id"), col("cell"), col("codes"), col("cn"))

    val a = appended.collect().map(key).sortBy(t => t._1)
    val f = full.collect().map(key).sortBy(t => t._1)
    assert(a.length == f.length && a.length == emb.count(),
      s"appended ${a.length} rows, full encode ${f.length}, corpus ${emb.count()}")
    a.zip(f).foreach { case (x, y) => assert(x == y, s"append/full drift: $x vs $y") }
  }

  test("search parity: the appended index serves identical results") {
    val (cents, codebook, baseCodes) = built
    val appended = SimilarityOps.ivfPqAppend(delta, "vec_id", "embedding",
      dim, m, cents, codebook, baseCodes)
    val assigned = SimilarityOps.ivfAssign(emb, "vec_id", "embedding", cents)
      .select(col("id").as("neighbor_id"), col("assigned_cell").as("cell"))
    val fullCodes = SimilarityOps.pqEncode(emb, "vec_id", "embedding", dim, m, codebook)
      .select(col("id").as("neighbor_id"), col("codes"))
      .join(assigned, "neighbor_id")
      .join(emb.select(col("vec_id").as("neighbor_id"),
        org.apache.spark.sql.graftx.GraftFunctions.vecNorm(
          col("embedding")).as("cn")), "neighbor_id")

    val queries = emb.filter(col("vec_id") % 37 === 0)
    def search(codes: DataFrame) = SimilarityOps.ivfPqSearch(
        queries, emb, "vec_id", "embedding", dim, m, ksub,
        cents, codebook, codes, nprobe = 4, candK = 50, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val viaAppend = search(appended)
    val viaFull = search(fullCodes)
    assert(viaAppend.nonEmpty && viaAppend.sameElements(viaFull),
      s"search drift: ${viaAppend.length} vs ${viaFull.length} rows")
  }

  test("appended ids are searchable: delta vectors surface as neighbors") {
    val (cents, codebook, baseCodes) = built
    val appended = SimilarityOps.ivfPqAppend(delta, "vec_id", "embedding",
      dim, m, cents, codebook, baseCodes)
    // full-open search (all cells probed, candK = n ≡ brute force up
    // to ADC candidate order, exact rescore): with k = 10 over a
    // ~500-vector corpus where every 10th id is delta, delta ids MUST
    // appear among the neighbors — impossible unless the append made
    // their codes visible to the cell-equi candidate join.
    val baseQueries = base.limit(16)
    val got = SimilarityOps.ivfPqSearch(baseQueries, emb, "vec_id", "embedding",
      dim, m, ksub, cents, codebook, appended,
      nprobe = 8, candK = emb.count().toInt, k = 10)
    assert(got.count() == 16 * 10, "every query must fill its k")
    assert(got.filter(col("neighbor_id") % 10 === 0).count() > 0,
      "no delta id ever surfaced as a neighbor — append not visible")
  }
}
