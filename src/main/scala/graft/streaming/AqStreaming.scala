package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row
import graft.pipeline.{AqPipeline, AqSchemas}

/** Structured-Streaming mode for the ingest flow the reference runs as
  * hourly Airflow batches (SURVEY §2.9): new NDJSON files arriving
  * under a raw directory are a file-source stream; the 24h
  * re-extraction overlap (`handler.py:268-269`) becomes a watermarked
  * streaming dedup; the transform+write reuses the exact batch stages
  * via `foreachBatch` (one code path for both modes).
  */
object AqStreaming {

  /** File-source stream over the raw NDJSON landing dir — the
    * streaming twin of `AqPipeline.readRaw`. `maxFilesPerTrigger`
    * bounds micro-batch size at scale.
    */
  def readRawStream(spark: SparkSession, path: String,
                    maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(AqSchemas.rawMeasurement)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ssXXX")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** Watermarked streaming dedup: state for (location_id, datetime,
    * parameter) keys is evicted once the watermark passes the 24h
    * re-extraction overlap — bounded state by construction
    * (SURVEY §7.4-6).
    */
  def dedupStream(raw: DataFrame, watermark: String = "24 hours"): DataFrame =
    AqPipeline.parseTimestamps(raw)
      .withWatermark("datetime", watermark)
      .dropDuplicatesWithinWatermark("location_id", "datetime", "parameter")

  /** Tumbling hourly per-location aggregates with late-data handling —
    * the streaming twin of the mart's hourly grain.
    */
  def hourlyAggregates(deduped: DataFrame): DataFrame =
    deduped
      .groupBy(window(col("datetime"), "1 hour"), col("location_id"), col("parameter"))
      .agg(avg("value").as("avg_value"), count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("location_id"),
        col("parameter"), col("avg_value"), col("n"))

  /** End-to-end streaming pipeline: micro-batches run the SAME batch
    * transform (pivot needs a full group view, so it runs per
    * micro-batch inside foreachBatch) and APPEND to the partitioned
    * mart.
    *
    * Append, not the batch path's dynamic partition overwrite: a
    * micro-batch holds only the files that arrived since the last
    * trigger, so overwriting a date partition would delete earlier
    * batches' rows that share it (a bug CheckpointResumeSpec guards
    * against). The checkpoint gives bookmark semantics (each file
    * ingested once); duplicates within the stream are dropped by the
    * watermarked dedup upstream. Exactly-once across batch REPLAYS
    * (driver crash mid-write) additionally needs a transactional
    * table format — with plain parquet this is at-least-once, the
    * same contract as the reference's append job.
    *
    * ROW-GRAIN CONTRACT: the streamed mart is per (location_id,
    * datetime, ARRIVAL batch) — when one key's parameters arrive in
    * different micro-batches, the mart holds multiple PARTIAL rows
    * with complementary non-null pollutant columns (the pivot can only
    * see its own batch). Readers that need the batch transform's
    * one-row-per-key shape run [[mergePartialRows]] on read, or as a
    * Maintenance-style compaction that rewrites the partition.
    */
  def streamToMart(spark: SparkSession, rawPath: String, martPath: String,
                   checkpoint: String): DataStreamWriter[Row] = {
    val deduped = dedupStream(readRawStream(spark, rawPath))
    deduped.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val wide = AqPipeline.enrich(
            AqPipeline.pivotParameters(batch),
            AqPipeline.locationDim(batch))
          val ordered = wide.select(
            Seq(col("location_id").cast("string").as("location_id"), col("datetime")) ++
              AqSchemas.parameters.map(col) ++
              Seq(col("city_name"), col("country_code"), col("latitude"),
                col("longitude"), col("year"), col("month"), col("day")): _*)
          ordered.write.mode("append")
            .partitionBy("year", "month", "day").parquet(martPath)
        }
      }
  }

  /** Merge cross-batch PARTIAL rows back to one row per
    * (location_id, datetime) — the read-side repair for
    * [[streamToMart]]'s row-grain contract.
    *
    * Correctness lean: the upstream watermarked dedup guarantees each
    * (location_id, datetime, parameter) reading passes the stream once,
    * so among a key's partial rows each pollutant column is non-null
    * in AT MOST one of them — `first(_, ignoreNulls)` is deterministic
    * here, it merely picks the single non-null. One shuffle on the
    * key; at scale, run per date partition (partition pruning keeps it
    * incremental).
    */
  def mergePartialRows(mart: DataFrame): DataFrame = {
    val valueCols = AqSchemas.parameters ++
      Seq("city_name", "country_code", "latitude", "longitude")
    val aggs = valueCols.map(c => first(col(c), ignoreNulls = true).as(c))
    mart.groupBy(col("location_id"), col("datetime"),
        col("year"), col("month"), col("day"))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        Seq(col("location_id"), col("datetime")) ++
          AqSchemas.parameters.map(col) ++
          Seq(col("city_name"), col("country_code"), col("latitude"),
            col("longitude"), col("year"), col("month"), col("day")): _*)
  }
}
