package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{DedupOps, QualityOps, RelationalOps}

/** End-to-end training-data curation: the composition the scale
  * operators exist for. One declarative flow over a `documents`-shaped
  * corpus (doc_id, text, lang, source):
  *
  *   1. text analysis — token counts, quality score, language ID
  *   2. gates — length/quality, repetition (dup-token + top-bigram
  *      boilerplate filters), and optional benchmark decontamination
  *   3. exact dedup — one survivor per content digest
  *   4. near-dup clustering — MinHash-LSH candidates, exact-Jaccard
  *      verified, connected components, keep cluster minimum
  *   5. domain-mixture downsampling (per-source content-hash rates)
  *      and a deterministic train/test split on a content-hash bucket
  *
  * Shuffle inventory at 100 TB: step 1 and the length/quality gate are
  * scan-local; the repetition gate shuffles (doc, bigram) partials;
  * decontamination broadcasts the benchmark shingle set; step 3 is
  * one digest-keyed hash aggregate; step 4 shuffles candidate pairs
  * only (banded LSH, never O(n²)); step 5 is scan-local. Every keep/
  * drop decision is content-deterministic, so incremental re-runs
  * converge.
  */
object CurationPipeline {

  case class Config(
      minTokens: Long = 10,
      minQuality: Double = 0.05,
      maxDupTokenFrac: Double = 0.95,
      maxTopBigramFrac: Double = 0.5,
      decontamNgram: Int = 8,
      nearDupSim: Double = 0.5,
      shingleSize: Int = 3,
      lshBands: Int = 8,
      lshRowsPerBand: Int = 4,
      mixtureRates16: Map[String, Int] = Map.empty, // source → keep k of 16
      trainFraction16: Int = 12) // of 16 hash buckets → train

  /** Annotate + gate + dedup + sample + split. Returns the curated
    * corpus with lineage columns (quality, cluster, split) retained
    * for audit. `benchmark` (doc_id, text) enables the held-out-set
    * decontamination gate.
    */
  def curate(docs: DataFrame, cfg: Config = Config(),
             benchmark: Option[DataFrame] = None): DataFrame = {
    // 1. analysis columns (scan-local, codegen'd)
    val annotated = docs
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("pred_lang", TextFunctions.langIdHeuristic(col("text")))
      .withColumn("fingerprint", md5(col("text").cast("binary")))

    // 2. gates: length/quality (scan-local), repetition (per-doc
    // bigram partials), optional benchmark decontamination
    val gated0 = annotated.filter(
      col("n_tokens") >= cfg.minTokens && col("quality") >= cfg.minQuality)
    val repetitionKeep = QualityOps.repetitionMetrics(gated0, "doc_id", "text",
        cfg.maxDupTokenFrac, cfg.maxTopBigramFrac)
      .filter(col("keep")).select("doc_id")
    val gated1 = gated0.join(repetitionKeep, "doc_id")
    val gated = benchmark.fold(gated1) { b =>
      gated1.join(
        QualityOps.contaminationScan(gated1, b, "doc_id", "text", cfg.decontamNgram)
          .filter(!col("contaminated")).select("doc_id"), "doc_id")
    }

    // 3. exact dedup: smallest doc_id per digest survives
    val exactKeep = gated.groupBy("fingerprint").agg(min("doc_id").as("doc_id"))
    val exact = gated.join(exactKeep, Seq("fingerprint", "doc_id"))

    // 4. near-dup clusters over the exact-deduped corpus
    val pairs = DedupOps.minHashLshPairs(exact, "doc_id", "text",
      cfg.shingleSize, cfg.lshBands, cfg.lshRowsPerBand, cfg.nearDupSim)
    val clusters = RelationalOps.connectedComponents(
      exact.select("doc_id"), "doc_id", pairs, "id_a", "id_b")
    val canonical = exact.join(clusters, "doc_id")
      .filter(col("doc_id") === col("cluster_id"))

    // 5. per-source mixture downsampling (content-hash deterministic;
    // unlisted sources keep everything), then the split
    val sampled =
      if (cfg.mixtureRates16.isEmpty) canonical
      else {
        val thr = cfg.mixtureRates16.foldLeft(lit(QualityOps.nibbleChar(16))) {
          case (acc, (src, k)) =>
            when(col("source") === src, lit(QualityOps.nibbleChar(k))).otherwise(acc)
        }
        canonical.filter(QualityOps.hashSampled(col("text"), thr))
      }
    sampled.withColumn("split",
      when(substring(col("fingerprint"), 1, 1).isin(
        (0 until cfg.trainFraction16).map(java.lang.Integer.toHexString): _*),
        lit("train")).otherwise(lit("test")))
      .select("doc_id", "text", "lang", "source", "n_tokens", "quality",
        "pred_lang", "fingerprint", "cluster_id", "split")
  }

  /** Write the curated corpus partitioned by split (train/test dirs —
    * the layout a training job consumes).
    */
  def write(curated: DataFrame, path: String): Unit = {
    curated.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    curated.write.mode("overwrite").partitionBy("split").parquet(path)
  }

  /** Corpus-level audit: one row of counts a curation run reports. */
  def audit(curated: DataFrame): DataFrame =
    curated.agg(
      count(lit(1)).as("n_docs"),
      count(when(col("split") === "train", 1)).as("n_train"),
      count(when(col("split") === "test", 1)).as("n_test"),
      countDistinct("cluster_id").as("n_clusters"),
      round(avg("quality"), 4).as("mean_quality"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val out = java.nio.file.Files.createTempDirectory("curated").toString
    val curated = curate(docs)
    write(curated, out)
    println("CURATED=" + spark.read.parquet(out).count())
    audit(curated).show()
    spark.stop()
  }
}
