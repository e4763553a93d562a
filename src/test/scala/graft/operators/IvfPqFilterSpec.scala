package graft.operators

import org.apache.spark.sql.functions._

/** Filtered IVF-PQ search ([[SimilarityOps.ivfPqSearch]] `preFilter`
  * over [[SimilarityOps.buildIvfPq]] `metaCols`): top-k among corpus
  * rows satisfying a metadata predicate — the filterable-attribute
  * feature of production vector indexes, as a PRE-filter on the coded
  * corpus (non-matching rows are never ADC-scored) rather than a
  * post-filter over an inflated k (which cannot guarantee k
  * survivors at any inflation factor).
  *
  * The load-bearing test mirrors IvfPqSpec's full-open identity:
  * with both approximation levers opened (nprobe = nCells, candK = n)
  * the filtered search must equal brute force over the PRE-FILTERED
  * corpus bit-for-bit — so the filter's only effect is the candidate
  * domain, never the arithmetic.
  */
class IvfPqFilterSpec extends graft.SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val (dim, m, ksub) = (64, 4, 4)
  private val pred = col("label") < 3

  test("full-open filtered identity == brute force over the filtered corpus") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val sample = emb.filter(col("vec_id") % SimilarityOps.sampleModulus(n, 16) === 0)
    val got = SimilarityOps.ivfPqTopK(sample, emb, "vec_id", "embedding",
        dim, m, ksub, nCells = 4, nprobe = 4, candK = n.toInt, k = 5,
        metaCols = Seq("label"), preFilter = Some(pred))
      .collect().map(_.toString).sorted.toSeq
    // the rescore reads vectors from the corpus frame, so hand the
    // brute twin the same filtered domain
    val bf = SimilarityOps.bruteForceTopK(sample, emb.filter(pred),
        "vec_id", "embedding", 5)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == bf,
      "fully-open filtered IVF-PQ diverged from filtered brute force")
  }

  test("every neighbor satisfies the predicate at the shipped geometry") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val nF = emb.filter(pred).count()
    val sample = emb.filter(col("vec_id") % SimilarityOps.sampleModulus(n, 32) === 0)
    val (nCells, nprobe) = SimilarityOps.ivfPqGeometry(n)
    // the gate row's inverse-selectivity probe scaling
    val nprobeF = SimilarityOps.filteredNprobe(nCells, nprobe, n, nF)
    val candK = math.max(100, math.min(nF / 10,
      20L * math.ceil(math.sqrt(nF.toDouble)).toLong)).toInt
    val tsMod = SimilarityOps.sampleModulus(n, math.max(512, 32 * nCells))
    val got = SimilarityOps.ivfPqTopK(sample, emb, "vec_id", "embedding",
      dim = 64, m = 16, ksub = 32, nCells = nCells, nprobe = nprobeF,
      candK = candK, k = 5,
      trainSample = if (tsMod <= 1) None
        else Some(emb.filter(col("vec_id") % tsMod === 0)),
      metaCols = Seq("label"), preFilter = Some(pred))
    val joined = got.join(
      emb.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
    assert(joined.count() == got.count(), "neighbor outside the corpus")
    assert(joined.filter(!pred).count() == 0,
      "filtered search returned a neighbor violating the predicate")
  }

  test("preFilter=None over a meta-carrying index == the plain search") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val sample = emb.filter(col("vec_id") % 37 === 0)
    val ts = Some(emb.filter(col("vec_id") % 3 === 0))
    def run(metaCols: Seq[String]) = SimilarityOps.ivfPqTopK(
        sample, emb, "vec_id", "embedding", dim, m, ksub,
        nCells = 8, nprobe = 4, candK = 50, k = 5,
        trainSample = ts, metaCols = metaCols)
      .collect().map(_.toString).sorted.toSeq
    val withMeta = run(Seq("label"))
    val without = run(Nil)
    assert(withMeta.nonEmpty && withMeta == without,
      "carrying metadata columns changed the unfiltered search")
  }

  test("append carries metadata: filtered search over an appended index") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    // sample-trained branch: append parity is exact there (see
    // ivfPqAppend's scaladoc)
    val (cents, codebook, baseCodes) = SimilarityOps.buildIvfPq(
      base, "vec_id", "embedding", dim, m, ksub, nCells = 8,
      trainSample = Some(base.filter(col("vec_id") % 3 === 0)),
      metaCols = Seq("label"))
    val appended = SimilarityOps.ivfPqAppend(delta, "vec_id", "embedding",
      dim, m, cents, codebook, baseCodes, metaCols = Seq("label"))
    assert(appended.columns.contains("label"), "append dropped the metadata")
    assert(appended.count() == emb.filter(col("label").isNotNull).count())
    val queries = emb.filter(col("vec_id") % 37 === 0)
    val got = SimilarityOps.ivfPqSearch(queries, emb, "vec_id", "embedding",
      dim, m, ksub, cents, codebook, appended,
      nprobe = 8, candK = emb.count().toInt, k = 5, preFilter = Some(pred))
      .collect().map(_.toString).sorted.toSeq
    val bf = SimilarityOps.bruteForceTopK(queries, emb.filter(pred),
        "vec_id", "embedding", 5)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == bf,
      "filtered full-open search over the appended index diverged")
  }
}
