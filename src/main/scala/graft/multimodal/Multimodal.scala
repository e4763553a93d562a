package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque
  * `binary` columns with typed metadata travelling alongside.
  *
  * The container has no media codecs, so the DECODE step is a clearly
  * marked deterministic stub (`StubDecoder`) — but everything Spark
  * cares about is real and tested: the schema contract, the batch
  * shape (mapPartitions over iterators — the Scala analogue of
  * `mapInPandas` batches), partitioning (decode runs where the bytes
  * are, no shuffle), and the metadata projection that lets Catalyst
  * prune the heavy binary column when a query only needs metadata.
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                       n_frames: Int, format: String)

  /** Attach a binary payload column (here: utf-8 bytes of the text —
    * a stand-in for real image bytes; real pipelines read them via
    * `spark.read.format("binaryFile")`).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "utf-8"))

  /** Container-format magic numbers (file signatures): leading-byte
    * hex prefix → MIME type. The real-world table is longer; these
    * cover the test matrix.
    */
  val MagicTable: Seq[(String, String)] = Seq(
    "89504E47" -> "image/png",   // \x89PNG
    "FFD8FF"   -> "image/jpeg",
    "47494638" -> "image/gif",   // GIF8
    "25504446" -> "application/pdf", // %PDF
    "52494646" -> "audio/wav")   // RIFF

  /** MIME sniffing over an opaque binary column — magic-byte prefix
    * match, entirely as codegen'd expressions (hex of the first 4
    * bytes, then a CASE ladder): the media-lake triage step that must
    * NOT read more than the header. Substring on binary keeps the
    * projected bytes at 4 per row no matter the payload size.
    */
  def sniffMime(payload: Column): Column = {
    val head = hex(substring(payload, 1, 4))
    MagicTable.foldRight(lit("application/octet-stream")) {
      case ((magic, mime), els) =>
        when(substring(head, 1, magic.length) === magic, lit(mime)).otherwise(els)
    }
  }

  /** Test/demo payloads with REAL magic headers: prepends the
    * doc_id-selected signature bytes to the stub payload so the sniff
    * path exercises true binary prefixes deterministically.
    */
  def withMagicPayload(docs: DataFrame): DataFrame = {
    val magics = MagicTable.map(_._1)
    val pick = magics.zipWithIndex.foldRight(unhex(lit(magics.last))) {
      case ((m, i), els) =>
        if (i == magics.size - 1) els
        else when(col("doc_id") % magics.size === i, unhex(lit(m))).otherwise(els)
    }
    withPayload(docs).withColumn("payload", concat(pick, col("payload")))
  }

  /** STUB: a real implementation would decode image bytes (e.g. via
    * javax.imageio / ffmpeg) inside the partition iterator. The stub
    * derives deterministic pseudo-dimensions from the byte length so
    * the plumbing is testable end-to-end without codecs.
    */
  object StubDecoder {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      MediaMeta(id, n, (n % 640).toInt, (n * 7 % 480).toInt,
        (n % 24).toInt + 1, "stub")
    }
  }

  /** Decode runs per-partition (no shuffle, bytes never move), one
    * iterator pass — the exact shape a Pandas-UDF `mapInPandas` decode
    * has in PySpark. Returns the typed metadata Dataset.
    */
  def decodeMeta(spark: SparkSession, withBytes: DataFrame,
                 idCol: String = "doc_id", payloadCol: String = "payload"): Dataset[MediaMeta] = {
    import spark.implicits._
    withBytes.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => StubDecoder.decode(id, bytes) })
  }

  /** Frame sampling stub: every k-th frame index of a (fake) video
    * payload — demonstrates the explode-to-frames shape where each
    * frame row stays on the executor that decoded it.
    */
  def sampleFrames(meta: Dataset[MediaMeta], everyK: Int): DataFrame =
    meta.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
      .select(col("doc_id"), col("frame_idx"))

  /** Segment fingerprints: the payload sliced into fixed-length
    * chunks, each chunk content-hashed — the video/audio dedup
    * primitive (per-segment hashing finds shared runs between media
    * files even when they diverge elsewhere; cf. chunk-level CDC
    * dedup). Emits one `(doc_id, ck, fp)` row per FULL chunk; the
    * trailing partial chunk is dropped so a short common suffix can't
    * fake a match. Runs where the payload is (projection + explode,
    * no shuffle); only 16-byte digests leave the scan.
    */
  def segmentFingerprints(docs: DataFrame, idCol: String, textCol: String,
                          chunkLen: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .withColumn("ck",
        explode(sequence(lit(0), floor(length(col("__t")) / chunkLen).cast("int"))))
      .withColumn("seg", expr(s"substring(__t, ck * $chunkLen + 1, $chunkLen)"))
      .filter(length(col("seg")) === chunkLen)
      .select(col("doc_id"), col("ck").cast("long").as("ck"),
        md5(col("seg")).as("fp"))

  /** Media near-dup via shared segments: pairs of docs sharing at
    * least `minShared` identical full chunks (fingerprint equi-join —
    * the inverted-index shape again; for web-scale corpora cap hot
    * fingerprints exactly like [[graft.operators.DedupOps
    * .ngramJaccardPairs]] caps stop-shingles).
    */
  def segmentNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          chunkLen: Int, minShared: Long): DataFrame = {
    // DISTINCT (doc, fp) before the self-join: `shared` counts distinct
    // fingerprints present in both docs. Joining raw occurrence rows
    // would square within-doc repeats (two unrelated payloads that each
    // contain the same 4 filler chunks — silence, zero runs — would
    // count 4×4=16 "shared" and false-positive the near-dup gate).
    val fp = segmentFingerprints(docs, idCol, textCol, chunkLen)
      .select("doc_id", "fp").distinct()
    fp.as("a")
      .join(fp.hint("SHUFFLE_HASH").as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** STUB feature extraction: media payload → `array<float>` embedding
    * (a real pipeline runs a vision/audio encoder here; the stub
    * feature-hashes rolling byte 8-grams into `dim` signed buckets and
    * L2-normalizes). Like a real encoder — and unlike a whole-payload
    * hash — it is LOCALITY-SENSITIVE: payloads sharing most of their
    * bytes land at cosine near 1, unrelated payloads near 0, so the
    * downstream near-dup/ANN stack exercises realistic geometry. The
    * SHAPE is the real contract: extraction runs in the partition that
    * holds the bytes (no shuffle; one iterator pass — the
    * `mapInPandas` encoder-batch shape), emitting `(id, embedding)`
    * rows for the similarity stack — near-dup
    * ([[graft.operators.SimilarityOps.embeddingLshPairs]]),
    * quantization (`quantizeInt8`), ANN search (`twoStageTopK` /
    * `ivfSearch`).
    *
    * Encoders are expensive, so MATERIALIZE the result (parquet table,
    * or `localCheckpoint` within a job) before feeding multi-reference
    * consumers like LSH — a pair op references the embedding column
    * several times, and an unmaterialized plan re-runs extraction for
    * each. (A pure-expression variant was measured SLOWER here: the
    * normalize-transform-of-transform nests interpreted HOFs that
    * re-evaluate per reference — same pitfall as the text ops that got
    * native Catalyst expressions.)
    */
  def stubEmbedding(withBytes: DataFrame, dim: Int,
                    idCol: String = "doc_id",
                    payloadCol: String = "payload"): DataFrame =
    stubEmbeddingPartitions(withBytes.sparkSession, withBytes, dim, idCol, payloadCol)

  /** The partition-iterator encoder itself (see [[stubEmbedding]] for
    * the contract). Takes the session explicitly for callers that
    * build the plan before a DataFrame exists.
    */
  def stubEmbeddingPartitions(spark: SparkSession, withBytes: DataFrame, dim: Int,
                              idCol: String = "doc_id",
                              payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    val gram = 8
    // 31^(gram-1), for removing the outgoing byte of the rolling hash
    val pOut = Iterator.fill(gram - 1)(31L).product
    withBytes.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val v = new Array[Double](dim)
        if (bytes.length >= gram) {
          // rolling polynomial hash over byte 8-grams, O(len) total
          var h = 0L
          var j = 0
          while (j < gram) { h = h * 31L + (bytes(j) & 0xffL); j += 1 }
          var i = 0
          val last = bytes.length - gram
          while (i <= last) {
            val g = h * 6364136223846793005L + 1442695040888963407L // mix
            v(((g >>> 33) % dim).toInt) += (if (((g >>> 32) & 1L) == 0L) 1.0 else -1.0)
            if (i < last)
              h = (h - (bytes(i) & 0xffL) * pOut) * 31L + (bytes(i + gram) & 0xffL)
            i += 1
          }
        }
        val norm0 = math.sqrt(v.map(x => x * x).sum)
        // sub-8-byte payloads produce the zero vector; a FIXED fallback
        // coordinate would make all tiny payloads identical (cosine 1.0
        // between unrelated blobs) — derive axis and sign from the
        // bytes instead so distinct tiny payloads stay distinct
        val norm = if (norm0 == 0.0) {
          var h = 1125899906842597L
          var j = 0
          while (j < bytes.length) { h = h * 31L + (bytes(j) & 0xffL); j += 1 }
          v(((h >>> 33) % dim).toInt) = if (((h >>> 32) & 1L) == 0L) 1.0 else -1.0
          1.0
        } else norm0
        (id, v.map(x => (x / norm).toFloat))
      }).toDF(idCol, "embedding")
  }
}
