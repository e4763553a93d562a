package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import graft.SparkSpec

class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("ts", TimestampType)))

  private def rec(id: Long, text: String, ts: String) =
    s"""{"doc_id": $id, "text": "$text", "ts": "$ts"}"""

  test("streaming pairs == batch simHashPairs; watermark evicts old members") {
    val dir = Files.createTempDirectory("nd_raw")
    val out = Files.createTempDirectory("nd_out").toString
    val ckpt = Files.createTempDirectory("nd_ckpt").toString
    // 60 tokens with a 1-token edit → SimHash Hamming 3 (probed);
    // short texts drift too far for a ≤3 radius
    val d0 = (1 to 60).map(i => s"token$i").mkString(" ")
    val d1 = d0.replace("token30 ", "changed ") // near-dup of d0
    val other = "completely different words entirely here now"
    def runAvailable(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(dir.toString)
      val q = NearDupStream.nearDupPairs(stream, "doc_id", "text", "ts",
          delay = "10 minutes", maxHamming = 3)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }
    // phase 1: originals + near-dup (pair emits whatever the file
    // order), then a doc that drags the watermark 3h forward
    Files.writeString(dir.resolve("f1.json"), Seq(
      rec(0, d0, "2024-01-01T10:00:00.000Z"),
      rec(9, other, "2024-01-01T10:00:30.000Z")).mkString("\n"))
    Files.writeString(dir.resolve("f2.json"), Seq(
      rec(1, d1, "2024-01-01T10:05:00.000Z")).mkString("\n"))
    Files.writeString(dir.resolve("f3.json"),
      rec(8, "unrelated watermark advancing content only", "2024-01-01T13:00:00.000Z"))
    runAvailable()
    // phase 2 restarts from the checkpoint: the watermark (12:50) is
    // already past the originals, so an exact copy of d0 finds its
    // buckets evicted and pairs with nothing
    Files.writeString(dir.resolve("f4.json"),
      rec(7, d0, "2024-01-01T13:00:30.000Z"))
    runAvailable()

    val pairs = spark.read.parquet(out)
      .select("id_a", "id_b", "hamming").distinct()
      .as[(Long, Long, Int)].collect().toSet

    // the in-horizon pair set equals the batch op over the same docs
    val batchDocs = Seq((0L, d0), (1L, d1), (9L, other)).toDF("doc_id", "text")
    val expected = graft.operators.DedupOps
      .simHashPairs(batchDocs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(expected == Set((0L, 1L)), s"batch twin sanity: $expected")
    assert(pairs.map(p => (p._1, p._2)) == expected,
      s"stream pairs $pairs != batch $expected")
    // doc 7 (identical to doc 0, 3h later) paired with nothing: its
    // buckets were evicted once the watermark passed the horizon
    assert(!pairs.exists(p => p._1 == 7L || p._2 == 7L))
  }
}
