package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus curation — the continuous-ingestion twin of the
  * batch curation operators ([[graft.operators.DedupOps]] /
  * [[graft.operators.QualityOps]]): documents arrive as a stream,
  * are content-fingerprinted and deduplicated with WATERMARK-BOUNDED
  * state, and quality-gated with the same pure expressions the batch
  * path uses (per-row expressions need no state at all).
  *
  * Division of labor at 100 TB: the stream drops duplicates arriving
  * within the re-delivery horizon (bounded state — one 16-byte digest
  * per distinct doc inside the watermark window); cross-run novelty
  * against the full historical corpus stays a batch anti-join on the
  * persisted fingerprint index (`DedupOps.incrementalExact`), which
  * no streaming state could hold.
  */
object CurationStream {

  /** Fingerprint + watermarked streaming dedup: exactly one row per
    * distinct content within the watermark horizon; digest state is
    * evicted once the event-time watermark passes `delay`.
    */
  def novelDocs(stream: DataFrame, textCol: String, eventTimeCol: String,
                delay: String): DataFrame =
    stream
      .withColumn("fingerprint", md5(col(textCol).cast("binary")))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Trending terms: Misra-Gries heavy hitters per event-time window —
    * the mergeable-sketch aggregate
    * ([[org.apache.spark.sql.graftx.MgHeavyHitters]]) running inside a
    * watermarked streaming aggregation. State per (window) group is
    * the k-counter sketch, NOT the token stream: bounded regardless of
    * traffic, exactly why sketches exist. Windows emit once closed
    * (append mode); the same expression runs batch-side
    * (`tx_heavy_hitters`), so stream and batch share one sketch
    * implementation and merge semantics.
    */
  def trendingTerms(stream: DataFrame, textCol: String, eventTimeCol: String,
                    windowDur: String, delay: String, k: Int): DataFrame = {
    import org.apache.spark.sql.graftx.MgHeavyHitters.mgHeavyHitters
    stream
      .select(col(eventTimeCol).as("ts"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowDur).as("win"))
      .agg(mgHeavyHitters(col("token"), k).as("hh"))
      .select(col("win.start").as("window_start"), explode(col("hh")).as("e"))
      .select(col("window_start"), col("e.item").as("item"),
        col("e.min_count").as("min_count"))
  }

  /** Streaming half of the PSI drift monitor (batch twin: `dq_drift`):
    * per event-time window bucket histogram of a value column with
    * FIXED bounds — a global min/max is unknowable on an unbounded
    * stream, so production bounds come from the reference window.
    * State per window is ≤ `nBuckets` counters; each closed window
    * emits its compact histogram, and PSI between any two windows is
    * then a join over histograms ([[psi]]), never over the event
    * stream itself.
    */
  def bucketHistogram(stream: DataFrame, valueCol: String,
                      eventTimeCol: String, lo: Double, hi: Double,
                      nBuckets: Int, windowDur: String,
                      delay: String): DataFrame =
    stream.withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), windowDur).as("win"),
        // clamp BOTH tails: values below `lo` must land in bucket 0,
        // not a negative id that psi()'s 0..n-1 spine join silently
        // drops — under-range drift is exactly what the monitor is for
        greatest(lit(0L), least(lit(nBuckets - 1),
          floor((col(valueCol) - lo) / ((hi - lo) / nBuckets))))
          .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("window_start"), col("bucket"), col("n"))

  /** Windowed streaming QUANTILES via the mergeable t-digest
    * aggregate ([[org.apache.spark.sql.graftx.TDigestQuantiles]]):
    * per (window, key) latency-percentile monitoring with BOUNDED
    * state — the state store holds one serialized digest (≤ ~8δ
    * centroids) per open group, never the raw values, so the p99 of
    * an unbounded stream costs the same state as its count. Each
    * micro-batch's partial digests merge into the stored one through
    * the aggregate's own merge path (the same machinery batch
    * partial-aggregation uses).
    */
  def windowedQuantiles(stream: DataFrame, keyCol: String,
                        valueCol: String, eventTimeCol: String,
                        percentages: Seq[Double], windowDur: String,
                        delay: String, compression: Int = 100): DataFrame = {
    import org.apache.spark.sql.graftx.TDigest.tdigestQuantiles
    stream.withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), windowDur).as("win"), col(keyCol))
      .agg(tdigestQuantiles(col(valueCol), percentages, compression).as("qq"))
      .select(col("win.start").as("window_start") +: col(keyCol) +:
        percentages.zipWithIndex.map { case (p, i) =>
          // per-mille names so nearby percentages (0.995 vs 1.0) can't
          // collide into duplicate output columns
          element_at(col("qq"), i + 1).as(s"p${(p * 1000).round}")
        }: _*)
  }

  /** Windowed streaming SAMPLE via the mergeable bottom-k-by-hash
    * aggregate ([[org.apache.spark.sql.graftx.BottomKByKey]]): per
    * (window, key) a deterministic uniform sample of `k` row ids with
    * BOUNDED state — the store holds ≤ k (hash, id) pairs per open
    * group regardless of stream volume, merged across micro-batches
    * by the aggregate's own merge path. Because bottom-k-by-hash is
    * order-insensitive, a window's emitted sample doesn't depend on
    * how the batches sliced the stream — replay-stable, and equal to
    * what the batch query would have picked over the same window.
    */
  def windowedSample(stream: DataFrame, keyCol: String, idCol: String,
                     eventTimeCol: String, k: Int, windowDur: String,
                     delay: String): DataFrame = {
    import org.apache.spark.sql.graftx.BottomKByKey.bottomK
    // the sample payload is a long: a non-numeric id would cast to null
    // and silently fill every emitted sample with nulls — reject early
    require(Seq("bigint", "int", "smallint", "tinyint")
      .contains(stream.schema(idCol).dataType.simpleString),
      s"windowedSample: $idCol must be an integral id column " +
        s"(got ${stream.schema(idCol).dataType.simpleString})")
    stream.withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), windowDur).as("win"), col(keyCol))
      .agg(bottomK(md5(col(idCol).cast("string").cast("binary")),
        col(idCol).cast("long"), k).as("sample_ids"))
      .select(col("win.start").as("window_start"), col(keyCol),
        col("sample_ids"))
  }

  /** Population stability index between two bucket histograms
    * (`(bucket, n)` rows, as [[bucketHistogram]] emits): each side is
    * first pooled to one count per bucket (so a multi-window histogram
    * is aggregated, never fanned out), then Laplace-smoothed shares
    * over the full generated spine, one scalar row out. Runs over the
    * compact histograms — at any corpus scale this is a
    * ≤ `nBuckets`-row computation.
    */
  def psi(histRef: DataFrame, histCur: DataFrame, nBuckets: Int): DataFrame = {
    val spark = histRef.sparkSession
    val spine = spark.range(0, nBuckets).select(col("id").as("bucket"))
    // collapse to one row per bucket FIRST: bucketHistogram's natural
    // multi-window output repeats buckets per window, and joining that
    // raw would fan out the spine and double-count — summing pools the
    // windows (and is the identity on a single-window histogram)
    def pooled(h: DataFrame, as: String) =
      h.groupBy("bucket").agg(sum("n").as(as))
    val joined = spine
      .join(pooled(histRef, "n_ref"), Seq("bucket"), "left")
      .join(pooled(histCur, "n_cur"), Seq("bucket"), "left")
    val totals = joined.agg(
      sum(coalesce(col("n_ref"), lit(0L))).as("t_ref"),
      sum(coalesce(col("n_cur"), lit(0L))).as("t_cur"))
    joined.crossJoin(broadcast(totals))
      .select(
        ((coalesce(col("n_ref"), lit(0L)) + 1) / (col("t_ref") + nBuckets).cast("double")).as("p"),
        ((coalesce(col("n_cur"), lit(0L)) + 1) / (col("t_cur") + nBuckets).cast("double")).as("q"))
      .agg(sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi"))
  }

  /** Stateless per-row quality gate (the streaming-safe subset of the
    * batch gates): token-level repetition + quality score, pure
    * expressions — no aggregation state, any output mode.
    */
  def qualityGate(stream: DataFrame, textCol: String,
                  maxDupTokenFrac: Double, minQuality: Double): DataFrame = {
    val tok = graft.functions.TextFunctions.tokens(col(textCol))
    stream
      .withColumn("dup_token_frac",
        lit(1.0) - size(array_distinct(tok)).cast("double") / size(tok))
      .withColumn("quality", graft.functions.TextFunctions.qualityScore(col(textCol)))
      .filter(col("dup_token_frac") <= maxDupTokenFrac &&
        col("quality") >= minQuality)
  }
}
