package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import graft.SparkSpec

/** Streaming bottom-k sample: per-(window, key) state is ≤ k (hash,
  * id) pairs no matter the volume, and — because bottom-k-by-hash is
  * order-insensitive — the emitted sample must equal the batch
  * computation over the same rows regardless of micro-batch slicing.
  */
class SampleStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("id", LongType),
    StructField("ts", TimestampType)))

  private def rec(k: String, id: Long, ts: String) =
    s"""{"k": "$k", "id": $id, "ts": "$ts"}"""

  test("windowed sample == batch bottom-k over the same window, across micro-batches") {
    val dir = Files.createTempDirectory("smp_raw")
    val out = Files.createTempDirectory("smp_out").toString
    val ckpt = Files.createTempDirectory("smp_ckpt").toString

    def ts(i: Int) = f"2024-01-01T10:${i % 50 / 10}%01d${i % 10}%01d:00.000Z"
    // ids split across two files so the stored heap must merge with a
    // later batch's partial
    Files.writeString(dir.resolve("f1.json"),
      (1 to 100).map(i => rec("a", i.toLong, ts(i))).mkString("\n"))
    Files.writeString(dir.resolve("f2.json"),
      (101 to 200).map(i => rec("a", i.toLong, ts(i))).mkString("\n"))
    Files.writeString(dir.resolve("f3.json"),
      rec("z", 0L, "2024-01-01T14:00:00.000Z")) // watermark sentinel

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir.toString)
    val q = CurationStream.windowedSample(stream, "k", "id", "ts",
        k = 10, windowDur = "1 hour", delay = "10 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val got = spark.read.parquet(out).filter($"k" === "a")
      .select("sample_ids").as[Seq[Long]].head()
    // the batch answer over the same 200 ids
    val want = (1L to 200L).toDF("id")
      .groupBy().agg(org.apache.spark.sql.graftx.BottomKByKey.bottomK(
        md5($"id".cast("string").cast("binary")), $"id", 10).as("s"))
      .select("s").as[Seq[Long]].head()
    assert(got == want, s"stream $got vs batch $want")
    assert(got.size == 10)
  }
}
