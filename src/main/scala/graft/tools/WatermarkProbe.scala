package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Diagnostic for the micro-batch/watermark mechanics the `st_*`
  * parity rows depend on: confirms that maxFilesPerTrigger=1 +
  * AvailableNow splits a parquet file source into one micro-batch per
  * file (mtime order), and measures WHEN the advancing watermark takes
  * effect for each stateful operator class (`dedup`, `dedupwm`, `agg`
  * arg). This is how the one-batch LAG in the late-event filter was
  * established (IncrementalExecution hands stateful operators the
  * PREVIOUS batch's watermark for late-row filtering and the fresh one
  * only for state eviction) — the fact `st_late_drop_parity`'s batch
  * split and oracle arithmetic encode. Prints per-batch rows /
  * watermark / dropped-by-watermark counts and the survivor count.
  *
  * Usage: runMain graft.tools.WatermarkProbe [dedup|dedupwm|agg]
  */
object WatermarkProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val stage = java.nio.file.Files.createTempDirectory("dbg_batches").toString
    def put(name: String, mtime: Long, hours: Seq[Int]): Unit = {
      val df = hours.toDF("h").select(
        col("h").cast("long").as("id"),
        (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long") +
          col("h") * 3600).cast("timestamp").as("ts"))
      val tmp = java.nio.file.Files.createTempDirectory("dbg_part").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(stage, name)
      java.nio.file.Files.copy(part.toPath, dst)
      dst.toFile.setLastModified(mtime)
    }
    // b1: hours 100..123 (max = h123). watermark(2h) after b1 = h121.
    // b2: hours 0..9 (ALL older than h121 -> should be dropped) plus h122.
    put("b1.parquet", 1000000L, 100 to 123)
    put("b2.parquet", 2000000L, Seq(123))
    put("b3.parquet", 3000000L, (0 to 9) :+ 122)

    val out = java.nio.file.Files.createTempDirectory("dbg_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dbg_ckpt").toString
    val mode = if (args.nonEmpty) args(0) else "dedup"
    val src = spark.readStream
      .schema("id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .withWatermark("ts", "2 hours")
    val sink = mode match {
      case "dedup" => src.dropDuplicates("id", "ts")
      case "dedupwm" => src.dropDuplicatesWithinWatermark("id")
      case "agg" => src.groupBy(window(col("ts"), "1 hour")).count()
        .select(col("window.start").as("ts"), col("count").as("id"))
    }
    val q = sink.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.recentProgress.foreach { p =>
      println(s"BATCH ${p.batchId}: rows=${p.numInputRows} watermark=${p.eventTime.get("watermark")} dropped=${p.stateOperators.map(_.numRowsDroppedByWatermark).mkString(",")}")
    }
    val res = spark.read.schema(sink.schema).parquet(out)
    println("SURVIVORS: " + res.count())
    spark.stop()
  }
}
