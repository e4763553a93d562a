package graft.pipeline

import graft.SparkSpec

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val longText =
    "the quick brown fox jumps over the lazy dog and then runs far away into the hills tonight"

  test("curate: gates, exact dedup, near-dup canonicalization, deterministic split") {
    val docs = Seq(
      (0L, longText, "en", "s"),
      (1L, longText, "en", "s"),                       // exact dup of 0 → dropped
      (2L, longText.replace("dog", "cat"), "en", "s"), // near-dup of 0 → clustered, dropped
      (3L, "too short", "en", "s"),                    // quality gate → dropped
      (4L, "completely different words entirely spoken here today " * 3, "en", "s")
    ).toDF("doc_id", "text", "lang", "source")

    val out = CurationPipeline.curate(docs,
      CurationPipeline.Config(minTokens = 5, minQuality = 0.0, nearDupSim = 0.5))
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 4L), s"kept $kept")

    // split is a pure function of content → stable across runs
    val split1 = out.select("doc_id", "split").as[(Long, String)].collect().toMap
    val split2 = CurationPipeline.curate(docs,
        CurationPipeline.Config(minTokens = 5, minQuality = 0.0, nearDupSim = 0.5))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split1 == split2)
  }

  test("repetition gate, decontamination, and mixture sampling compose into curate") {
    val bench = Seq((100L, "held out benchmark sentence that must never leak into training data"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (0L, longText, "en", "sA"),
      // contains an 8-gram of the benchmark doc → decontaminated
      (1L, "prefix held out benchmark sentence that must never leak into training data suffix", "en", "sA"),
      // degenerate repetition → repetition gate
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam", "en", "sA"),
      (3L, "completely different words entirely spoken here today " * 3, "en", "sB")
    ).toDF("doc_id", "text", "lang", "source")

    // doc 3 repeats a 7-token sentence 3× → dup_token_frac ≈ 0.64 (kept
    // at 0.7); doc 2 is one token 12× → ≈ 0.92 (dropped)
    val cfg = CurationPipeline.Config(minTokens = 5, minQuality = 0.0,
      maxDupTokenFrac = 0.7, nearDupSim = 0.5)
    val kept = CurationPipeline.curate(docs, cfg, Some(bench))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L), s"kept $kept")

    // mixture: source sB sampled at 0/16 disappears, sA at 16/16 stays
    val mixed = CurationPipeline.curate(docs,
        cfg.copy(mixtureRates16 = Map("sB" -> 0, "sA" -> 16)), Some(bench))
      .select("doc_id").as[Long].collect().toSet
    assert(mixed == Set(0L), s"kept $mixed")
  }

  test("audit reports consistent totals and real clustering metrics") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val curated = CurationPipeline.curate(docs)
    val a = CurationPipeline.audit(curated).head()
    assert(a.getAs[Long]("n_docs") ==
      a.getAs[Long]("n_train") + a.getAs[Long]("n_test"))
    // cluster metrics come from the carried cluster_size (the old
    // countDistinct(cluster_id) was vacuously == n_docs on the
    // canonical frame): every multi-doc cluster removes >= 1 doc,
    // and zero clusters means zero removed
    val nc = a.getAs[Long]("n_neardup_clusters")
    val nr = a.getAs[Long]("n_neardup_removed")
    assert(nr >= nc, s"each multi-doc cluster removes at least one: $nc/$nr")
    assert((nc == 0) == (nr == 0))
    val minSize = curated.agg(org.apache.spark.sql.functions.min("cluster_size"))
      .head().getLong(0)
    assert(minSize >= 1L)
  }
}
