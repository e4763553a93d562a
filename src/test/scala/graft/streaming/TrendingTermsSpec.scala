package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import graft.SparkSpec

class TrendingTermsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("ts", TimestampType)))

  private def rec(id: Long, text: String, ts: String) =
    s"""{"doc_id": $id, "text": "$text", "ts": "$ts"}"""

  test("windowed Misra-Gries sketch in append mode equals batch heavy hitters") {
    val dir = Files.createTempDirectory("tt_raw")
    val out = Files.createTempDirectory("tt_out").toString
    val ckpt = Files.createTempDirectory("tt_ckpt").toString
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(dir.toString)
      val q = CurationStream.trendingTerms(stream, "text", "ts",
          windowDur = "1 hour", delay = "10 minutes", k = 4)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }
    // window 10:00-11:00, tokens arriving across two micro-batches
    Files.writeString(dir.resolve("f1.json"), Seq(
      rec(0, "spark spark table", "2024-01-01T10:05:00.000Z"),
      rec(1, "spark hash", "2024-01-01T10:10:00.000Z")).mkString("\n"))
    Files.writeString(dir.resolve("f2.json"),
      rec(2, "spark table row", "2024-01-01T10:20:00.000Z"))
    run()
    // phase 2 closes the 10:00 window (watermark passes 11:10)
    Files.writeString(dir.resolve("f3.json"),
      rec(3, "late unrelated content", "2024-01-01T13:00:00.000Z"))
    run()

    val got = spark.read.parquet(out)
      .filter(col("window_start") === lit("2024-01-01 10:00:00").cast("timestamp"))
      .select("item", "min_count").as[(String, Long)].collect().toMap
    // true window counts: spark=4, table=2, hash=1, row=1 (n=8, k=4).
    // MG guarantees (any arrival/merge order — counters themselves are
    // order-dependent, so assert the guarantees, not exact values):
    val truth = Map("spark" -> 4L, "table" -> 2L, "hash" -> 1L, "row" -> 1L)
    // every item over the n/(k+1) = 1.6 threshold must be reported
    assert(got.contains("spark") && got.contains("table"), s"got $got")
    // reported min_counts never exceed true counts, and undercount by
    // at most n/(k+1)
    got.foreach { case (item, c) =>
      assert(truth.contains(item) && c <= truth(item) &&
        c >= truth(item) - 8 / 5, s"$item -> $c vs ${truth.get(item)}")
    }
    // the later window (13:00 doc) stayed open — nothing emitted for it
    val windows = spark.read.parquet(out).select("window_start").distinct().count()
    assert(windows == 1L, s"expected only the closed window, got $windows")
  }
}
