package graft.streaming

import java.nio.file.Files

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Output row of the windowed agg (top-level: Spark encoders cannot
  * capture a spec-inner class's outer scope).
  */
case class StreamRetryOut(hour: java.sql.Timestamp, event_type: String, n: Long)

/** Task-retry EXACTLY-ONCE inside a stateful streaming micro-batch.
  * `TaskRetrySpec` pins retry determinism for batch sinks/aggs;
  * `CheckpointResumeSpec` and the `st_*restart*` rows pin DRIVER
  * failure (stop + new query on the checkpoint). The class neither
  * covers is a TASK retry inside a stateful micro-batch — the state
  * store's per-task abort/retry interplay with the offset log and the
  * sink commit protocol: a failed attempt must discard its
  * uncommitted state-store delta and its sink file, and the retried
  * attempt must rebuild from the last committed state version, or the
  * stream "succeeds" with double-counted or lost windows.
  *
  * Harness: the st_restart_agg_parity shape (append-mode
  * window(1 h) × event_type counts under a real 1-hour watermark,
  * two staged batches + a far-future heartbeat flushing every real
  * window, and a STOP + new-query restart between the batches — so
  * the retried tasks also interact with a checkpoint round-trip).
  * Failures are injected in the STATEFUL stage itself: a typed
  * mapPartitions fused after the aggregation (same stage as
  * StateStoreRestore/Save — no shuffle in between) drains its whole
  * partition, then throws on every even partition's FIRST attempt in
  * EVERY micro-batch, under the shared local[4, 2] master (exactly
  * one retry). The final sink content must equal the one-shot batch
  * aggregation bit-for-bit.
  */
class StreamRetrySpec extends graft.SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Stage `df` as one parquet file with a controlled mtime (the file
    * source orders micro-batches by modification time).
    */
  private def stageFile(df: DataFrame, stageDir: java.nio.file.Path,
                        name: String, mtime: Long): Unit = {
    val tmp = Files.createTempDirectory("graft_retry_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dst = stageDir.resolve(name)
    Files.copy(part.toPath, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dst.toFile.setLastModified(mtime)
    ()
  }

  private def fingerprint(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("\u0001"))
      .sorted.toSeq

  test("windowed-agg stream is exactly-once under injected task retries in the stateful stage") {
    runRetryCase(rocksdb = false)
  }

  test("same exactly-once property on the RocksDB state backend") {
    // the production provider keeps state off-heap + native; a failed
    // attempt must roll back its uncommitted RocksDB changelog exactly
    // like the HDFS provider discards its delta — task retry and
    // backend choice compose, or failover behavior would be
    // provider-dependent
    val conf = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(conf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try runRetryCase(rocksdb = true)
    finally spark.conf.unset(conf)
  }

  private def runRetryCase(rocksdb: Boolean): Unit = {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("ts"), col("event_type"))
    val bounds = ev.agg(min("ts").as("lo"), max("ts").as("hi")).collect()(0)
    val (lo, hi) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
    val cutoff = new java.sql.Timestamp((lo.getTime + hi.getTime) / 2)
    val heartbeat = spark.range(1).select(
      lit(new java.sql.Timestamp(hi.getTime + 2L * 86400 * 1000)).as("ts"),
      lit("hb").as("event_type"))

    val stage = Files.createTempDirectory("graft_retry_in")
    val outDir = Files.createTempDirectory("graft_retry_out").toString
    val ckpt = Files.createTempDirectory("graft_retry_ckpt").toString
    // counts RETRIED attempts (attemptNumber > 0) — proves tasks
    // genuinely died and were re-run. Counted on the successful
    // second attempt, not at the throw site: Spark discards
    // accumulator updates from failed tasks, so incrementing where
    // the exception is raised always reads 0
    val retried = spark.sparkContext.longAccumulator(
      if (rocksdb) "stream_retry_retried_rocksdb" else "stream_retry_retried")

    def runOnce(label: String): Unit = {
      val agg = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("hour"), col("event_type"), col("n"))
        .as[StreamRetryOut]
        // fused into the STATEFUL stage (no shuffle below the agg):
        // drain the partition — driving StateStoreSave's own iterator,
        // i.e. the state updates/evictions for this attempt — then die
        // on the first attempt of every even partition
        .mapPartitions { it =>
          val tc = TaskContext.get()
          if (tc != null && tc.attemptNumber() > 0) retried.add(1)
          if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() % 2 == 0)
            new Iterator[StreamRetryOut] {
              def hasNext: Boolean = {
                if (!it.hasNext) throw new RuntimeException(
                  s"[StreamRetrySpec] injected first-attempt failure after " +
                    s"draining partition ${tc.partitionId()}")
                true
              }
              def next(): StreamRetryOut = it.next()
            }
          else it
        }
      val q = agg.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(300000), s"$label did not finish")
    }

    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      stageFile(ev.filter(col("ts") <= cutoff), stage, "b1.parquet", 1000000L)
      runOnce("retry stream run 1")
      stageFile(ev.filter(col("ts") > cutoff).unionByName(heartbeat),
        stage, "b2.parquet", 2000000L)
      runOnce("retry stream run 2")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)

    val got = spark.read.parquet(outDir)
      .filter(col("event_type") =!= "hb")
      .select("hour", "event_type", "n")
    val expect = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(fingerprint(got) == fingerprint(expect),
      "retried stateful stream diverged from the one-shot batch aggregation")
    // non-vacuous: the injector genuinely fired — tasks really died
    // and were re-attempted — and every window flushed
    assert(retried.value > 0, "no task was ever re-attempted")
    assert(got.count() === expect.count())
  }
}
