package graft.streaming

import java.nio.file.Files
import graft.SparkSpec

/** End-to-end Structured Streaming test: NDJSON files land in a dir,
  * the stream dedups within the watermark and writes the partitioned
  * mart via foreachBatch (AvailableNow → drains and stops).
  */
class AqStreamingSpec extends SparkSpec {

  private val rec =
    """{"location_id": 18, "sensor_id": 37, "datetime": "2024-01-15T10:00:00+07:00",
      | "parameter": "pm25", "value": 45.5, "unit": "ug/m3",
      | "extracted_at": "2024-01-15T11:00:00", "location_name": "SPARTAN",
      | "city": "Hanoi", "timezone": "Asia/Bangkok", "country": "VN",
      | "latitude": 21.0285, "longitude": 105.8542}""".stripMargin.replaceAll("\n", "")

  test("file-source stream → watermark dedup → partitioned mart") {
    val raw = Files.createTempDirectory("aq_stream_raw")
    val mart = Files.createTempDirectory("aq_stream_mart").toString
    val ckpt = Files.createTempDirectory("aq_stream_ckpt").toString
    // two files: second contains a duplicate of the first record plus a new one
    Files.writeString(raw.resolve("h1.json"), rec + "\n")
    val rec2 = rec.replace("2024-01-15T10:00:00+07:00", "2024-01-15T11:00:00+07:00")
    Files.writeString(raw.resolve("h2.json"), rec + "\n" + rec2 + "\n")

    val q = AqStreaming.streamToMart(spark, raw.toString, mart, ckpt).start()
    q.awaitTermination(120000)

    val out = spark.read.parquet(mart)
    // duplicate collapses: 2 distinct (location, datetime) rows
    assert(out.count() == 2)
    assert(out.schema.fieldNames.contains("pm25"))
  }
}
