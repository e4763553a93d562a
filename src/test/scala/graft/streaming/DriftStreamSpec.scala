package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType, TimestampType}
import graft.SparkSpec

/** Streaming PSI drift: windowed bucket histograms must equal the
  * batch histogram of the same events, and PSI over the emitted
  * compact histograms must separate a shifted window from an
  * identical one.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("value", DoubleType),
    StructField("ts", TimestampType)))

  private def rec(id: Long, v: Double, ts: String) =
    s"""{"event_id": $id, "value": $v, "ts": "$ts"}"""

  test("windowed histograms equal batch; PSI flags the shifted window") {
    val dir = Files.createTempDirectory("drift_raw")
    val out = Files.createTempDirectory("drift_out").toString
    val ckpt = Files.createTempDirectory("drift_ckpt").toString
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(dir.toString)
      val q = CurationStream.bucketHistogram(stream, "value", "ts",
          lo = 0.0, hi = 10.0, nBuckets = 5,
          windowDur = "1 hour", delay = "10 minutes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }
    // window 10:00 — low values; window 11:00 — shifted high
    Files.writeString(dir.resolve("f1.json"), (
      (0 until 8).map(i => rec(i, 1.0 + (i % 2), s"2024-01-01T10:0$i:00.000Z")) :+
        rec(8, 9.0, "2024-01-01T10:09:00.000Z")).mkString("\n"))
    Files.writeString(dir.resolve("f2.json"), (
      (0 until 8).map(i => rec(10 + i, 8.0 + (i % 2), s"2024-01-01T11:0$i:00.000Z")) :+
        rec(18, 1.0, "2024-01-01T11:09:00.000Z")).mkString("\n"))
    run()
    // close both windows (watermark passes 12:10)
    Files.writeString(dir.resolve("f3.json"),
      rec(99, 5.0, "2024-01-01T14:00:00.000Z"))
    run()

    val hist = spark.read.parquet(out).cache()
    // streaming histogram == batch histogram of the same records
    val batch = spark.read.schema(schema).json(dir.toString)
      .filter(col("ts") < lit("2024-01-01 12:00:00").cast("timestamp"))
      .groupBy(date_trunc("hour", col("ts")).as("window_start"),
        least(lit(4), floor(col("value") / 2)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val got = hist.as[(java.sql.Timestamp, Long, Long)].collect().toSet
    val want = batch.as[(java.sql.Timestamp, Long, Long)].collect().toSet
    assert(got == want, s"stream $got vs batch $want")

    val w10 = hist.filter(col("window_start") === lit("2024-01-01 10:00:00").cast("timestamp"))
    val w11 = hist.filter(col("window_start") === lit("2024-01-01 11:00:00").cast("timestamp"))
    val drift = CurationStream.psi(w10, w11, nBuckets = 5)
      .head().getDouble(0)
    val self = CurationStream.psi(w10, w10, nBuckets = 5)
      .head().getDouble(0)
    assert(drift > 0.2, s"shifted-window PSI $drift should alert")
    assert(math.abs(self) < 1e-12, s"self-PSI $self should be 0")
  }
}
