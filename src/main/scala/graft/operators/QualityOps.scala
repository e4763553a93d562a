package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{ngrams, tokens}

/** Corpus-curation operators a training-data pipeline runs between
  * raw ingestion and training: benchmark decontamination, repetition
  * gating, and deterministic mixture sampling. All relational (explode
  * → aggregate → join) with no UDFs, so every op is oracle-checkable
  * and scales by partitioning on the exploded key.
  */
object QualityOps {

  /** Shuffle-key skew report — the preflight a 100 TB job runs BEFORE
    * a big join/groupBy to decide whether the key needs salting or
    * AQE skew handling: rows are bucketed by a hash of the key
    * (md5-hex prefix, so DuckDB can replay the identical bucketing),
    * and each bucket reports its row count and skew factor
    * (n_rows × buckets / total — 1.0 is perfectly even; a hot key
    * shows up as one bucket ≫ 1). One partial-aggregated exchange of
    * (bucket, count) pairs regardless of table size; the tiny
    * per-bucket frame then gets its global total from a single-
    * partition window (buckets rows, not data rows).
    */
  def keySkewReport(df: DataFrame, keyCol: String, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = pmod(
      conv(substring(md5(col(keyCol).cast("string").cast("binary")), 1, 6), 16, 10)
        .cast("long"),
      lit(buckets.toLong))
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("skew", graft.functions.DetRound.r4(
        col("n_rows") * lit(buckets.toDouble) /
          sum("n_rows").over(Window.partitionBy())))
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * one token n-gram with any document of a held-out benchmark set
    * (the n-gram–collision test-set-leakage check used when preparing
    * training corpora).
    *
    * Returns one row per corpus doc: (idCol, n_shared, contaminated)
    * where n_shared counts the corpus doc's DISTINCT shingles that
    * occur anywhere in the benchmark set.
    *
    * Scale shape: the benchmark side is tiny relative to the corpus
    * (thousands of docs vs billions), so its distinct-shingle set is
    * BROADCAST and the corpus-side explode never shuffles the text —
    * each corpus partition streams its shingles past the in-memory
    * benchmark set, then one partial-aggregated count per doc. At
    * 100 TB the only exchange is the final per-doc count (~16 B/row).
    * Shingles stay as strings here for oracle parity; hash them to
    * 64-bit (`xxhash64`) when the benchmark set is large enough for
    * the broadcast to matter.
    */
  def contaminationScan(corpus: DataFrame, benchmark: DataFrame,
                        idCol: String, textCol: String, n: Int): DataFrame = {
    val benchGrams = benchmark
      .select(explode(array_distinct(ngrams(col(textCol), n))).as("g"))
      .distinct()
    val hits = corpus
      .select(col(idCol), explode(array_distinct(ngrams(col(textCol), n))).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }

  /** Repetition metrics per document (the Gopher-style quality gates
    * for machine-generated / boilerplate text):
    *
    *   - `dup_token_frac`  = 1 − distinct_tokens / total_tokens
    *   - `top_bigram_frac` = occurrences of the most frequent bigram
    *                         / total bigrams (0 when < 2 tokens)
    *   - `keep` = both fractions under the given ceilings
    *
    * Token-level fractions are pure per-row expressions; the top-bigram
    * share is explode → count → per-doc max (two partial-aggregated
    * shuffles keyed by (doc, bigram) then doc — no skew, since one
    * doc's bigrams are bounded by its length).
    */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String,
                        maxDupTokenFrac: Double,
                        maxTopBigramFrac: Double): DataFrame = {
    val tok = tokens(col(textCol))
    val base = docs.select(col(idCol),
      size(tok).cast("double").as("nt"),
      size(array_distinct(tok)).cast("double").as("nd"))
    val top = docs
      .select(col(idCol), explode(ngrams(col(textCol), 2)).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(max("c").as("top_c"), sum("c").as("n_bg"))
    base.join(top, Seq(idCol), "left")
      .select(col(idCol),
        (lit(1.0) - col("nd") / col("nt")).as("dup_token_frac"),
        coalesce(col("top_c").cast("double") / col("n_bg"), lit(0.0))
          .as("top_bigram_frac"))
      // coalesce: a null-text doc has null metrics and would otherwise
      // fall through BOTH filter(keep) and filter(!keep) — it must land
      // on the rejected side of the gate accounting
      .withColumn("keep",
        coalesce(col("dup_token_frac") <= maxDupTokenFrac &&
          col("top_bigram_frac") <= maxTopBigramFrac, lit(false)))
  }

  /** Hex nibble character c such that `nibble < c` holds for exactly
    * `k` of the 16 md5 nibbles ('g' at k = 16: always true).
    */
  def nibbleChar(k: Int): String = {
    require(k >= 0 && k <= 16, s"nibble threshold out of range: $k")
    "0123456789abcdefg".charAt(k).toString
  }

  /** Deterministic content-hash sampling predicate: true for ~k/16 of
    * rows when `thrNibble` = [[nibbleChar]](k). Keyed on content, not
    * rand(), so the sample is reproducible across runs, engines and
    * repartitionings — the property domain-mixture sampling needs so a
    * re-run of the pipeline yields the same training mix. `thrNibble`
    * may vary per row (per-domain mixture weights via when/otherwise).
    */
  def hashSampled(text: Column, thrNibble: Column): Column =
    substring(md5(text.cast("binary")), 1, 1) < thrNibble
}
