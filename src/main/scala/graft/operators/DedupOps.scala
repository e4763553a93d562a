package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Document-deduplication operators for training-data pipelines, each
  * designed around the shuffle/skew behavior it has at 100 TB:
  *
  *  - exact: one hash-aggregate shuffle on a 128-bit digest (never on
  *    the raw text — the shuffle carries ~48B/row, not documents).
  *  - MinHash+LSH: near-dup candidates via banded signatures; shuffle
  *    keys are (band, bandHash) buckets, so cost is O(candidates), not
  *    O(n²). Exact Jaccard verification only on candidates.
  *  - SimHash: 64-bit signature; pigeonhole banding (4×16 bits finds
  *    every pair with Hamming ≤ 3) then bit_count verification.
  *  - n-gram Jaccard: exact — pairs sharing ≥1 shingle via an
  *    inverted-index self-join; complete (a pair with no shared shingle
  *    has Jaccard 0), used as the oracle-checkable ground truth.
  *
  * Everything is Column-expression based (codegen'd, distributed); the
  * only UDF-free exception is nothing — there are no UDFs.
  */
object DedupOps {

  /** Exact dedup: group by content digest, keep the smallest id.
    * At scale: map-side partial agg on md5 makes the shuffle tiny; the
    * digest is computed in the scan stage (whole-stage codegen).
    */
  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** The persisted fingerprint index [[incrementalExact]] dedups
    * against: one row per distinct content digest seen so far. Write
    * it bucketed on `fingerprint`
    * ([[graft.io.CatalogOps.saveAsBucketedTable]]) and the daily
    * anti-join below runs shuffle-free on the index side.
    */
  def fingerprintIndex(docs: DataFrame, textCol: String): DataFrame =
    docs.select(md5(col(textCol).cast("binary")).as("fingerprint")).distinct()

  /** Incremental exact dedup — the mode a 100 TB corpus actually runs
    * daily: dedup the new batch against the persisted fingerprint
    * index instead of re-deduplicating the whole corpus. Returns one
    * row per NOVEL digest (content never seen before) with the batch's
    * surviving doc and its in-batch copy count; union the returned
    * fingerprints into the index afterwards.
    *
    * Scale shape: anti-join on the 16-byte digest (both sides partial-
    * agg'd/bucketable), never on content; the batch (days) is small
    * against the index (years), so the exchange is bounded by the
    * increment size plus the index's bucketed scan.
    */
  def incrementalExact(batch: DataFrame, idCol: String, textCol: String,
                       seenIndex: DataFrame): DataFrame =
    batch.withColumn("fingerprint", md5(col(textCol).cast("binary")))
      .join(seenIndex.select("fingerprint"), Seq("fingerprint"), "left_anti")
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Two-tier incremental exact dedup: [[incrementalExact]] semantics,
    * but the batch is prefiltered MAP-SIDE against a bloom filter
    * built from the fingerprint index — only rows the filter flags as
    * possibly-seen pay the exact anti-join shuffle; rows the filter
    * clears are novel by construction (bloom filters have no false
    * negatives). At a typical daily-batch novelty rate, that is most
    * of the batch skipping the join entirely; false positives merely
    * ride through the exact check and come out correct.
    *
    * Result is row-identical to [[incrementalExact]] at ANY filter
    * sizing — sizing only moves the skip fraction.
    */
  def incrementalExactBloom(batch: DataFrame, idCol: String, textCol: String,
                            seenIndex: DataFrame,
                            expectedItems: Long = 1000000L,
                            numBits: Long = 8000000L): DataFrame = {
    import org.apache.spark.sql.graftx.BloomOps
    // one partial-agg pass over the index builds the filter; it ships
    // to the probe side as a binary LITERAL (might_contain requires a
    // constant — this is the materialized form of the scalar subquery
    // InjectRuntimeFilter plans). The build is a deliberate pre-query
    // action, like pageRank's node count: sketch once, reuse all batch.
    val bfBytes = seenIndex.agg(
      BloomOps.bloomAgg(col("fingerprint"), expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // empty index → the aggregate yields null bytes; everything in the
    // batch is novel and the exact join would see an empty build side
    // anyway — just run the plain path
    if (bfBytes == null)
      return incrementalExact(batch, idCol, textCol, seenIndex)
    val tagged = batch
      .withColumn("fingerprint", md5(col(textCol).cast("binary")))
      .withColumn("might", BloomOps.mightContain(lit(bfBytes), col("fingerprint")))
    // might_contain(bf, null) is null: route null-text rows (null
    // fingerprint) down the definitely-novel path so the output stays
    // row-identical to incrementalExact, where null keys survive the
    // left_anti join as their own novel group
    val clearedNovel = tagged.filter(!coalesce(col("might"), lit(false)))
      .select(col("fingerprint"), col(idCol))
    val checkedNovel = tagged.filter(coalesce(col("might"), lit(false)))
      .join(seenIndex.select("fingerprint"), Seq("fingerprint"), "left_anti")
      .select(col("fingerprint"), col(idCol))
    clearedNovel.unionAll(checkedNovel)
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Exact n-gram Jaccard similarity pairs via inverted-index self-join.
    * Output: (id_a, id_b, shared, n_a, n_b, jaccard) for jaccard ≥ minSim,
    * id_a < id_b. Complete (no false negatives): pairs sharing zero
    * shingles have similarity 0.
    *
    * Scale shape: `explode(shingles)` then self-join on the shingle —
    * the classic inverted index. Hot shingles (stop-phrases) create
    * join skew; cap posting-list length via a frequency filter
    * (`maxPosting`) exactly like web-dedup systems drop stop-shingles.
    *
    * The join key is the 64-bit xxhash64 of the shingle, not the
    * string: fixed-width exchange rows and integer key compares make
    * the posting self-join ~3× faster (and the b-side is hinted to a
    * shuffled-hash join — postings are skew-free after the cap, so
    * skipping both sort passes is safe; partition count sizes the
    * build side). A hash collision merges two shingles' postings and
    * can perturb one pair's `shared` by 1: P ≈ d²/2⁶⁵ for d distinct
    * shingles — immaterial against the minSim threshold even at
    * billions of shingles.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, minSim: Double,
                        maxPosting: Option[Int] = None): DataFrame = {
    // NO parallelism floor here (measured +80% at sf0.1): the posting
    // relation is consumed three ways (hot-cap aggregate + both join
    // sides) and its heavy stages are already key-shuffled 32-way —
    // the extra exchange costs more than the 1-task shingle derivation
    val sh = docs.select(col(idCol).as("doc_id"),
      TextFunctions.shingleSet(col(textCol), n).as("ng"))
    // each posting row carries its doc's set size, so the pair
    // aggregation below needs NO extra joins back to a sizes table
    // (two fewer shuffles; n_ng is constant within a pair group).
    val posting0 = sh.select(col("doc_id"),
      size(col("ng")).cast("long").as("n_ng"), explode(col("ng")).as("g0"))
      .withColumn("g", xxhash64(col("g0"))).drop("g0")
    val posting = maxPosting match {
      case Some(cap) =>
        // drop shingles appearing in more than `cap` docs (skew guard).
        // The HOT set is what's small (stop-phrases), so broadcast it
        // into a LEFT ANTI join — the posting table itself is never
        // re-shuffled for the cap, at any corpus size.
        val hot = posting0.groupBy("g").count().filter(col("count") > cap).select("g")
        posting0.join(broadcast(hot), Seq("g"), "left_anti")
      case None => posting0
    }
    posting.as("a")
      .join(posting.hint("SHUFFLE_HASH").as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"),
        max(col("a.n_ng")).as("n_a"), max(col("b.n_ng")).as("n_b"))
      .withColumn("jaccard", col("shared") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= minSim)
      .select("id_a", "id_b", "shared", "n_a", "n_b", "jaccard")
  }

  /** Asymmetric shingle CONTAINMENT: for each query-side document,
    * corpus documents that contain ≥ `minContain` of its shingles —
    * the quote/subset-detection direction Jaccard can't see (a short
    * fragment fully inside a long doc has low Jaccard but containment
    * ≈ 1). This is the fraction-grade sibling of the decontamination
    * scan: query side is the small relation (benchmark prompts, doc
    * prefixes, suspected quotes), corpus side is the big one.
    *
    * Scale shape: inverted-index equi-join on hashed shingles — the
    * corpus is never self-joined; per-shingle work is f_query ×
    * f_corpus. The skew cap drops corpus-hot shingles via a broadcast
    * LEFT ANTI (same guard as [[ngramJaccardPairs]]); `n_q` stays the
    * full query-set size so capped shingles only LOWER containment
    * (no false positives from the cap).
    */
  def containmentPairs(queryDocs: DataFrame, qIdCol: String, qTextCol: String,
                       corpus: DataFrame, cIdCol: String, cTextCol: String,
                       n: Int, minContain: Double,
                       maxPosting: Option[Int] = None): DataFrame = {
    def postings(df: DataFrame, id: String, text: String, outId: String) =
      // parallelism floor before the shingle blow-up (identity at scale)
      RelationalOps.parallelismFloor(df, col(id))
        .select(col(id).as(outId), TextFunctions.shingleSet(col(text), n).as("ng"))
        .select(col(outId), size(col("ng")).cast("long").as("n_set"),
          explode(col("ng")).as("g0"))
        .withColumn("g", xxhash64(col("g0"))).drop("g0")
    val qPost = postings(queryDocs, qIdCol, qTextCol, "q_id")
      .withColumnRenamed("n_set", "n_q")
    val cPost0 = postings(corpus, cIdCol, cTextCol, "c_id").drop("n_set")
    val cPost = maxPosting match {
      case Some(cap) =>
        val hot = cPost0.groupBy("g").count().filter(col("count") > cap).select("g")
        cPost0.join(broadcast(hot), Seq("g"), "left_anti")
      case None => cPost0
    }
    qPost.join(cPost, "g")
      .filter(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id")
      .agg(count(lit(1)).as("shared"), max(col("n_q")).as("n_q"))
      .withColumn("containment", col("shared") / col("n_q"))
      .filter(col("containment") >= minContain)
      .select("q_id", "c_id", "shared", "n_q", "containment")
  }

  /** Incremental near-dup: n-gram Jaccard pairs that TOUCH the new
    * batch — each pair's greater id is in the batch (batch-vs-history
    * and batch-vs-batch; history-vs-history pairs were found when
    * those docs were themselves the increment). The daily mode of
    * [[ngramJaccardPairs]]: the posting join is (history+batch) ×
    * batch instead of corpus², so per-shingle candidate work is
    * f_full × f_batch, bounded by the increment — the full corpus is
    * never self-joined. Persist the full-corpus posting table bucketed
    * on `g` and the wide side never re-shuffles either.
    *
    * The stop-shingle cap is computed over the FULL corpus (identical
    * hot set to a from-scratch run, so results are replay-consistent).
    * Requires history ids < batch ids (monotonic doc ids — the natural
    * ingest order), so "greater id in batch" enumerates each pair
    * exactly once via the a.id < b.id join condition.
    */
  def incrementalNgramPairs(history: DataFrame, batch: DataFrame,
                            idCol: String, textCol: String,
                            n: Int, minSim: Double,
                            maxPosting: Option[Int] = None): DataFrame = {
    def postings(docs: DataFrame) = {
      val sh = docs.select(col(idCol).as("doc_id"),
        TextFunctions.shingleSet(col(textCol), n).as("ng"))
      sh.select(col("doc_id"), size(col("ng")).cast("long").as("n_ng"),
          explode(col("ng")).as("g0"))
        .withColumn("g", xxhash64(col("g0"))).drop("g0")
    }
    val batchPosting = postings(batch)
    val fullPosting = postings(history).unionByName(batchPosting)
    val (full, inc) = maxPosting match {
      case Some(cap) =>
        val hot = fullPosting.groupBy("g").count()
          .filter(col("count") > cap).select("g")
        (fullPosting.join(broadcast(hot), Seq("g"), "left_anti"),
          batchPosting.join(broadcast(hot), Seq("g"), "left_anti"))
      case None => (fullPosting, batchPosting)
    }
    full.as("a")
      .join(inc.hint("SHUFFLE_HASH").as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"),
        max(col("a.n_ng")).as("n_a"), max(col("b.n_ng")).as("n_b"))
      .withColumn("jaccard", col("shared") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= minSim)
      .select("id_a", "id_b", "shared", "n_a", "n_b", "jaccard")
  }

  /** MinHash signature (k permutations) of a shingle array column —
    * the native one-pass [[org.apache.spark.sql.graftx.MinHashSignature]]
    * expression (h_i(x) = (a_i·x32 + b_i) mod 2^61-1, overflow-free).
    */
  def minHashSignature(shingles: Column, k: Int): Column =
    org.apache.spark.sql.graftx.GraftFunctions.minHashSignature(shingles, k)

  /** MinHash+LSH near-duplicate pairs: signature → bands → bucket join
    * → exact-Jaccard verification on candidates only.
    *
    * Shuffle discipline (the 100 TB shape): band rows carry ONLY
    * `(doc_id, band, band_hash)` — 24 bytes/row — through the
    * posexplode and the candidate self-join; the shingle arrays
    * (~8× the document text if carried per band) stay in the compact
    * per-doc `sh` table and are joined back exactly once per side
    * AFTER candidate pairs are deduped. Same answer, the exchange
    * volume drops from O(bands × content) to O(bands × 24B).
    *
    * @param bands × rowsPerBand = signature length. With (8,4) the
    *   collision curve is steep around J≈0.5.
    */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, bands: Int, rowsPerBand: Int,
                      minSim: Double): DataFrame = {
    val k = bands * rowsPerBand
    val sh = docs.select(col(idCol).as("doc_id"),
      TextFunctions.shingleSet(col(textCol), n).as("ng"))
      .filter(size(col("ng")) > 0)
    // band id + hash of the band's slice of the signature; NO payload
    val banded = sh.select(col("doc_id"),
      minHashSignature(col("ng"), k).as("sig"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val cand = banded.as("a")
      .join(banded.hint("SHUFFLE_HASH").as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // exact verification on the deduped candidate set only: the only
    // rows that ever carry two shingle arrays at once
    val verified = cand
      .join(sh.select(col("doc_id").as("id_a"), col("ng").as("ng_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("ng").as("ng_b")), "id_b")
    val inter = size(array_intersect(col("ng_a"), col("ng_b"))).cast("double")
    val uni = (size(col("ng_a")) + size(col("ng_b"))).cast("double") - inter
    verified.withColumn("jaccard", inter / uni)
      .filter(col("jaccard") >= minSim)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of the token stream — the native one-pass
    * [[org.apache.spark.sql.graftx.SimHash64]] expression (per-bit
    * majority vote of xxhash64 token bits).
    */
  def simHash(text: Column): Column =
    org.apache.spark.sql.graftx.GraftFunctions.simHash64(TextFunctions.tokens(text))

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming (≤ 3):
    * pigeonhole on 4 16-bit bands (any pair within distance 3 agrees on
    * at least one band) then exact bit_count verification — the
    * standard scalable SimHash join (Manku et al., WWW'07 structure).
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole guarantees recall only for distance <= 3")
    val sigs = docs.select(col(idCol).as("doc_id"), simHash(col(textCol)).as("sim"))
    val bandArr = array((0 until 4).map(b =>
      shiftright(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val banded = sigs.select(col("doc_id"), col("sim"), posexplode(bandArr))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_val")
    banded.as("a")
      .join(banded.hint("SHUFFLE_HASH").as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).cast("long").as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Canonical-document selection: for each duplicate cluster (from
    * [[graft.operators.RelationalOps.connectedComponents]]) keep the
    * member with the highest `qualityCol` (ties → lowest id); every
    * other member is marked dropped. This is the KEEP/DROP decision a
    * curation pipeline applies after near-dup clustering — emitted as
    * a full audit table (one row per doc) rather than just the kept
    * set, so the drop side is reviewable.
    *
    * Scale: one shuffle on `clusterCol` for the window; the quality
    * join is key-equi on the doc id. No driver-side state.
    */
  def canonicalPerCluster(clusters: DataFrame, idCol: String, clusterCol: String,
                          quality: DataFrame, qIdCol: String,
                          qualityCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // LEFT join: a cluster member missing from the quality table must
    // still appear in the audit (and lose the keep contest — Spark's
    // desc sorts NULLS LAST), not silently vanish from the output
    val joined = clusters.join(
      quality.select(col(qIdCol).as(idCol), col(qualityCol)), Seq(idCol), "left")
    val w = Window.partitionBy(clusterCol)
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    joined
      .withColumn("keep_id", first(col(idCol)).over(w))
      .withColumn("is_kept", col(idCol) === col("keep_id"))
      .select(col(idCol), col(clusterCol), col("keep_id"), col("is_kept"))
  }

  /** Chunk-level global dedup (the C4 "repeated line" rule adapted to
    * unstructured token streams, RefinedWeb/MassiveText-style): split
    * each document into consecutive `chunkTokens`-token chunks (tail
    * chunk may be short), keep each distinct chunk only at its FIRST
    * corpus occurrence — (doc id, chunk index) lexicographic — and
    * report per-document retention.
    *
    * Scale: chunk digests are computed inside the scan projection via
    * array ops (split → slice → md5 per chunk, no UDF), so the exploded
    * relation — and therefore the one shuffle, on the digest — carries
    * (id, chunkIdx, 32-char digest) rows, never token arrays or text.
    * First-occurrence choice is a window rank over the digest
    * partition; per-doc rollup is a map-side-combinable count.
    */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
                 chunkTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(col(textCol), " ")
    val nChunks = floor((size(toks) - 1) / chunkTokens).cast("int")
    val digests = transform(sequence(lit(0), nChunks), i =>
      md5(array_join(slice(toks, i * chunkTokens + 1, lit(chunkTokens)), " ")
        .cast("binary")))
    val exploded = docs
      .select(col(idCol), posexplode(digests).as(Seq("chunk_idx", "digest")))
    val w = Window.partitionBy("digest").orderBy(col(idCol), col("chunk_idx"))
    exploded
      .withColumn("rn", row_number().over(w))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("kept_chunks"))
  }

  /** Maximal cross-document repeated substrings — the exact-substring
    * dedup of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better" (the ExactSubstr step): every maximal character
    * span of length ≥ k that also occurs verbatim in at least
    * `minDocs − 1` OTHER documents, reported per document as
    * (span_start, span_end, span_len) so a curation pass can excise
    * repeated boilerplate instead of dropping whole documents.
    *
    * Relational re-expression of their suffix-array scan: every
    * k-char window of every document becomes a (doc, pos, gram) row;
    * grams occurring in ≥ minDocs distinct docs mark their positions
    * shared; runs of CONSECUTIVE shared positions merge into maximal
    * spans via the islands trick (pos − row_number is constant within
    * a run), each covering [first pos, last pos + k − 1]. A span of
    * length L > k appears as L − k + 1 consecutive shared windows, so
    * maximal-span recovery is exact.
    *
    * Scale shape: the window relation has one row per character —
    * the same linear blow-up a distributed suffix array pays — but
    * the wide shuffle never carries gram STRINGS. Pass 1 computes all
    * window hashes per document in ONE O(n) Karp–Rabin sweep
    * ([[org.apache.spark.sql.graftx.WindowHashes]] — the naive form
    * pays O(n·k) substring allocations before hashing) and groups the
    * 8-byte keys to find candidate hashes touching ≥ minDocs docs (a
    * superset of the true shared grams — hash collisions only ADD
    * candidates); pass 2 recomputes the gram string for candidate
    * positions only and applies the exact cross-doc filter there. For
    * a mostly-unique corpus the exact verification runs on a small
    * fraction of the windows, so the result is byte-identical to the
    * naive single-pass string plan (and to the DuckDB oracle) at ~1/5
    * the shuffle volume.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    k: Int, minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftx.GraftFunctions.windowHashes
    // parallelism floor BEFORE the per-character blow-up: the window
    // relation is ~1000× its input, so the derivation must be spread
    // even when the input is one parquet row group (r13 measured the
    // whole query serializing on a 1-task scan; identity at scale)
    val spread = RelationalOps.parallelismFloor(
      docs.filter(length(col(textCol)) >= k), col(idCol))
    val hashed = spread
      .select(col(idCol), posexplode(windowHashes(col(textCol), k)).as(Seq("p0", "h")))
      .select(col(idCol), (col("p0") + 1).as("p"), col("h"))
    // "appears in ≥ minDocs DISTINCT docs": for the ubiquitous
    // minDocs=2 case, count_distinct(id) ≥ 2 ⟺ min(id) ≠ max(id) —
    // EXACTLY, with single-phase min/max partial aggregation instead
    // of the two-exchange (key, id)-distinct rewrite Spark plans for
    // count_distinct (guide §2.3: aggregate before you shuffle; the
    // window relation here is one row per CHARACTER, so the saved
    // exchange carries the corpus's whole character count)
    def inMinDocs(grouped: org.apache.spark.sql.RelationalGroupedDataset) =
      if (minDocs == 2)
        grouped.agg(min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"))
          .filter(col("__mn") =!= col("__mx"))
      else
        grouped.agg(count_distinct(col(idCol)).as("nd"))
          .filter(col("nd") >= minDocs)
    // pass 1: candidate hashes — 8-byte shuffle keys, no strings
    val candHashes = inMinDocs(hashed.groupBy("h")).select("h")
    // pass 2: exact verification on the candidate subset only
    val candGrams = hashed.join(candHashes, "h")
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .select(col(idCol), col("p"), expr(s"substring($textCol, p, $k)").as("gram"))
    val shared = inMinDocs(candGrams.groupBy("gram")).select("gram")
    val marked = candGrams.join(shared, "gram").select(col(idCol), col("p"))
    val w = Window.partitionBy(idCol).orderBy("p")
    marked
      .withColumn("grp", col("p") - row_number().over(w))
      .groupBy(col(idCol), col("grp"))
      .agg(min("p").as("span_start"),
        (max("p") + (k - 1)).as("span_end"),
        (max("p") + (k - 1) - min("p") + 1).as("span_len"))
      .select(col(idCol), col("span_start"), col("span_end"), col("span_len"))
  }
}
