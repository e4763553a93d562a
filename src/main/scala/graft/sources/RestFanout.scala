package graft.sources

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Distributed per-key fan-out fetch — the at-scale form of the
  * reference's per-sensor measurement loop (SURVEY §2.1 S4:
  * `etls/openaq_etl.py:185-260` GETs `/sensors/{id}/measurements`
  * sequentially with a rate-limit sleep; ~45-50 min/month of backfill,
  * `historical_backfill_2025_plan.md:516-523`).
  *
  * Here the id set is a Dataset: `mapPartitions` runs the fetches on
  * executors with a per-partition token-interval rate limit, so total
  * throughput scales with partitions while honoring per-worker API
  * budgets. The fetcher is injected (`Long => Seq[String]`, returning
  * NDJSON records) — HTTP in production, deterministic stubs in tests
  * (the container has no egress).
  */
object RestFanout {

  implicit private val stringEnc: Encoder[String] = Encoders.STRING

  /** @param minIntervalMs minimum milliseconds between fetches within
    *   one partition (the reference's `time.sleep(rate_limit)` per
    *   request, but per executor slot instead of globally serial).
    */
  def fetchPerKey(ids: Dataset[java.lang.Long],
                  fetcher: Long => Seq[String],
                  minIntervalMs: Long = 0L): Dataset[String] =
    ids.mapPartitions { it =>
      var lastCall = 0L
      it.flatMap { id =>
        if (minIntervalMs > 0) {
          val wait = lastCall + minIntervalMs - System.currentTimeMillis()
          if (wait > 0) Thread.sleep(wait)
          lastCall = System.currentTimeMillis()
        }
        fetcher(id)
      }
    }

  /** Parse fetched NDJSON records against an explicit schema —
    * composes with [[graft.pipeline.AqPipeline.transform]] for the
    * full extract→transform path.
    */
  def parsed(spark: SparkSession, records: Dataset[String],
             schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.read.schema(schema).json(records)
}
