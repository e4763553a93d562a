package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType, TimestampType}
import graft.SparkSpec

/** Streaming t-digest quantiles: the serialized digest is the ONLY
  * per-group state (bounded, values never retained), merged across
  * micro-batches by the aggregate's own merge path. Closed windows
  * must emit quantiles within the digest's rank-error envelope of the
  * exact per-key distribution.
  */
class QuantileStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("value", DoubleType),
    StructField("ts", TimestampType)))

  private def rec(k: String, v: Double, ts: String) =
    s"""{"k": "$k", "value": $v, "ts": "$ts"}"""

  test("per-key windowed p50/p99 from digest state ≈ exact; merge across micro-batches") {
    val dir = Files.createTempDirectory("tdq_raw")
    val out = Files.createTempDirectory("tdq_out").toString
    val ckpt = Files.createTempDirectory("tdq_ckpt").toString

    // key a: 1..100 uniform; key b: 901..1000 — split across two files
    // so the stored digest must merge with a later batch's partial
    def ts(i: Int) = f"2024-01-01T10:${i % 50 / 10}%01d${i % 10}%01d:00.000Z"
    Files.writeString(dir.resolve("f1.json"),
      ((1 to 50).map(i => rec("a", i.toDouble, ts(i))) ++
       (901 to 950).map(i => rec("b", i.toDouble, ts(i)))).mkString("\n"))
    Files.writeString(dir.resolve("f2.json"),
      ((51 to 100).map(i => rec("a", i.toDouble, ts(i))) ++
       (951 to 1000).map(i => rec("b", i.toDouble, ts(i)))).mkString("\n"))
    // late sentinel pushes the watermark past the 10:00 window
    Files.writeString(dir.resolve("f3.json"),
      rec("z", 0.0, "2024-01-01T14:00:00.000Z"))

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir.toString)
    val q = CurationStream.windowedQuantiles(stream, "k", "value", "ts",
        percentages = Seq(0.5, 0.99), windowDur = "1 hour", delay = "10 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val got: Map[String, (Double, Double)] = spark.read.parquet(out)
      .filter(col("k").isin("a", "b"))
      .select("k", "p500", "p990").as[(String, Double, Double)]
      .collect().map { case (k, p50, p99) => k -> ((p50, p99)) }.toMap
    assert(got.keySet == Set("a", "b"))
    def rankErr(est: Double, lo: Int, hi: Int, q: Double): Double = {
      val n = hi - lo + 1
      math.abs((lo to hi).count(_ <= est).toDouble / n - q)
    }
    val (a50, a99) = got("a")
    assert(rankErr(a50, 1, 100, 0.5) <= 0.02, s"a p50=$a50")
    assert(rankErr(a99, 1, 100, 0.99) <= 0.02, s"a p99=$a99")
    val (b50, b99) = got("b")
    assert(rankErr(b50, 901, 1000, 0.5) <= 0.02, s"b p50=$b50")
    assert(rankErr(b99, 901, 1000, 0.99) <= 0.02, s"b p99=$b99")
  }
}
