package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** STUB feature extraction: media payload → `array<float>` embedding
    * (a real pipeline runs a vision/audio encoder here; the stub
    * derives a deterministic unit-norm vector from rolling byte
    * hashes). The SHAPE is the real contract: extraction runs in the
    * partition that holds the bytes (no shuffle; one iterator pass —
    * the `mapInPandas` encoder-batch shape), emitting `(id, embedding)`
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
    withBytes.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val v = new Array[Float](dim)
        var h = 1125899906842597L // deterministic seed
        var i = 0
        while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
        var d = 0
        while (d < dim) {
          h = h * 6364136223846793005L + 1442695040888963407L // LCG step
          v(d) = ((h >>> 40).toInt - (1 << 23)).toFloat // symmetric around 0
          d += 1
        }
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
        (id, v.map(x => (x / norm).toFloat))
      }).toDF(idCol, "embedding")
  }
}
