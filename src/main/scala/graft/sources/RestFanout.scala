package graft.sources

import scala.util.control.NonFatal
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Outcome of one key's fetch after retries: either `ok` with the
  * fetched NDJSON records, or a quarantine row carrying the final
  * error — a failed key NEVER aborts its partition (the reference's
  * retry policy, `dags/openaq_dag.py:13-23`, re-expressed per key
  * instead of per task so one flaky sensor can't fail a 10k-key
  * partition).
  */
case class FetchOutcome(id: Long, ok: Boolean, attempts: Int,
                        records: Seq[String], error: String)

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
        require(id != null,
          "fetchPerKey: null id in the key set (use fetchPerKeyResilient to quarantine)")
        if (minIntervalMs > 0) {
          val wait = lastCall + minIntervalMs - System.currentTimeMillis()
          if (wait > 0) Thread.sleep(wait)
          lastCall = System.currentTimeMillis()
        }
        fetcher(id)
      }
    }

  implicit private val outcomeEnc: Encoder[FetchOutcome] = Encoders.product[FetchOutcome]

  /** [[fetchPerKey]] with bounded exponential backoff and failure
    * quarantine. Attempt i sleeps `baseBackoffMs * 2^(i-1)` (capped at
    * `maxBackoffMs`) before retrying; after `maxAttempts` the key is
    * emitted as a quarantine row instead of throwing, so the partition
    * (and the job) survives persistent per-key failures. The sleeper is
    * injectable for deterministic tests.
    */
  def fetchPerKeyResilient(ids: Dataset[java.lang.Long],
                           fetcher: Long => Seq[String],
                           maxAttempts: Int = 3,
                           baseBackoffMs: Long = 200L,
                           maxBackoffMs: Long = 10000L,
                           minIntervalMs: Long = 0L,
                           sleeper: Long => Unit = Thread.sleep): Dataset[FetchOutcome] =
    ids.mapPartitions { it =>
      var lastCall = 0L
      it.map { boxed =>
        // a null key (left-join miss, bad upstream cast) cannot be
        // fetched — quarantine it immediately instead of NPE-ing
        // OUTSIDE the retry loop and aborting the partition this
        // function promises to keep alive
        if (boxed == null)
          FetchOutcome(Long.MinValue, ok = false, attempts = 0, Seq.empty,
            error = "NullKey: null id cannot be fetched")
        else {
          val id = boxed.longValue()
          if (minIntervalMs > 0) {
            val wait = lastCall + minIntervalMs - System.currentTimeMillis()
            if (wait > 0) sleeper(wait)
            lastCall = System.currentTimeMillis()
          }
          var attempt = 0
          var result: FetchOutcome = null
          while (result == null) {
            attempt += 1
            try {
              result = FetchOutcome(id, ok = true, attempt, fetcher(id), error = "")
            } catch {
              case NonFatal(e) if attempt < maxAttempts =>
                // cap the exponent: a large maxAttempts would shift the
                // base past Long range and hand Thread.sleep a negative
                sleeper(math.min(
                  baseBackoffMs << math.min(attempt - 1, 20), maxBackoffMs))
              case NonFatal(e) =>
                result = FetchOutcome(id, ok = false, attempt, Seq.empty,
                  error = s"${e.getClass.getSimpleName}: ${e.getMessage}")
            }
          }
          result
        }
      }
    }

  /** Successfully fetched NDJSON records from a resilient fan-out. */
  def records(outcomes: Dataset[FetchOutcome]): Dataset[String] =
    outcomes.filter(_.ok).flatMap(_.records)

  /** Quarantined keys (exhausted retries) — persisted for replay, the
    * reference's failed-key audit trail.
    */
  def quarantined(outcomes: Dataset[FetchOutcome]): Dataset[FetchOutcome] =
    outcomes.filter(o => !o.ok)

  /** Parse fetched NDJSON records against an explicit schema —
    * composes with [[graft.pipeline.AqPipeline.transform]] for the
    * full extract→transform path.
    */
  def parsed(spark: SparkSession, records: Dataset[String],
             schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.read.schema(schema).json(records)
}
