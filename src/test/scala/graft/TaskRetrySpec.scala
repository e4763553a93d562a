package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Task-RETRY determinism: on a real cluster every long job loses
  * tasks (preemption, OOM kill, disk fault) and the scheduler re-runs
  * them — if a re-attempted task can produce different bytes than its
  * first attempt would have (rand(), partition-id salts, unordered
  * reductions surfaced to output), the job "succeeds" with silently
  * corrupted output. `ReplayStabilitySpec` replays whole queries; it
  * cannot see RETRY nondeterminism because a clean run never
  * re-attempts anything. Here failures are INJECTED: a first-attempt
  * throw (TaskContext-keyed, after half the partition is consumed —
  * a mid-task death, not a clean never-started one) under the shared
  * session's `local[4, 2]` master forces the scheduler down the real
  * retry path, and the output must equal the uninjected run exactly.
  *
  * Covered classes:
  *   - salted aggregation / salted join (RelationalOps — the
  *     content-hash salt must be attempt-invariant; a partition-id or
  *     rand salt would re-deal rows on retry);
  *   - a parquet SINK with the failure inside the write stage (the
  *     commit protocol must discard the dead attempt's file — the
  *     compaction class: k12's Maintenance.compact rewrites files
  *     whose content must not depend on which attempt survived);
  *   - flagship composite + top-k + sketch queries re-read through a
  *     retried final stage.
  */
class TaskRetrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Re-plan `df` with a mid-partition first-attempt failure in every
    * even-indexed partition of the FINAL stage: half the rows are
    * consumed (work genuinely done, then lost), then the task dies.
    * `local[4, 2]` gives the scheduler exactly one retry.
    */
  private def injectRetry(df: DataFrame): DataFrame = {
    val schema = df.schema
    val rdd = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val tc = TaskContext.get()
      if (pid % 2 == 0 && tc != null && tc.attemptNumber() == 0) {
        val buf = it.buffered
        var consumed = 0
        while (buf.hasNext && consumed < 64) { buf.next(); consumed += 1 }
        throw new RuntimeException(
          s"[TaskRetrySpec] injected first-attempt failure (partition $pid, " +
            s"$consumed rows consumed)")
      } else it
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Canonical multiset fingerprint — column order fixed by name, rows
    * sorted, so only CONTENT differences fail. The U+0001 field
    * separator (written as an escape — a raw control byte here reads
    * as an EMPTY separator to reviewers) keeps distinct rows from
    * colliding via concatenation (("ab","c") vs ("a","bc")) — a
    * collision would mask a retry-nondeterminism diff as a false
    * pass.
    */
  private def fingerprint(rows: Array[Row]): Seq[String] =
    rows.map(_.toSeq.map(String.valueOf).mkString("\u0001")).sorted.toSeq

  private def assertRetryStable(name: String, df: DataFrame): Unit = {
    val clean = fingerprint(df.collect())
    val retried = fingerprint(injectRetry(df).collect())
    assert(retried.size == clean.size,
      s"$name: retry changed row count ${clean.size} -> ${retried.size}")
    assert(retried == clean, s"$name: retried output differs from clean run")
  }

  test("injection harness actually retries (attempt 1 observed, attempt 0 dies)") {
    val attempts = spark.sparkContext.collectionAccumulator[Int]("attempts")
    val out = spark.range(0, 100, 1, 4).rdd.mapPartitionsWithIndex { (pid, it) =>
      val tc = TaskContext.get()
      attempts.add(tc.attemptNumber())
      if (pid % 2 == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException("die once")
      it
    }.collect()
    assert(out.length == 100)
    // both even partitions must have recorded a first AND second attempt
    assert(attempts.value.contains(1), "no task ever re-attempted — master lost [4, 2]?")
  }

  test("salted aggregation is attempt-invariant") {
    import graft.operators.RelationalOps
    val line = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag").as("k"), col("l_quantity"), col("l_extendedprice"))
    val salted = RelationalOps.saltedAgg(line, "k", salts = 8)(
      Seq(sum("l_quantity").as("sq"), count(lit(1)).as("n")),
      Seq(sum("sq").as("sum_qty"), sum("n").as("n_rows")))
    assertRetryStable("saltedAgg", salted.orderBy("k"))
  }

  test("salted join is attempt-invariant") {
    import graft.operators.RelationalOps
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("k"), col("o_totalprice"))
    val cust = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    val joined = RelationalOps.saltedJoin(orders, cust, "k", salts = 4)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"),
        sum("o_totalprice").as("sp"))
    assertRetryStable("saltedJoin", joined)
  }

  test("parquet sink: dead write attempt's file is discarded, content exact") {
    val out1 = java.nio.file.Files.createTempDirectory("retry_sink1").toString
    val out2 = java.nio.file.Files.createTempDirectory("retry_sink2").toString
    val df = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .repartition(4, col("user_id"))
    // clean write vs a write whose even tasks die mid-partition on
    // attempt 0 — the commit protocol must keep ONLY attempt-1 files
    df.write.mode("overwrite").parquet(out1)
    injectRetry(df).write.mode("overwrite").parquet(out2)
    val a = fingerprint(spark.read.parquet(out1).collect())
    val b = fingerprint(spark.read.parquet(out2).collect())
    assert(a == b, "sink content differs under write-task retry")
  }

  test("compaction rewrite is attempt-invariant end to end") {
    val base = java.nio.file.Files.createTempDirectory("retry_compact").toString + "/t"
    Tables.load(spark, sf, "events").repartition(16)
      .write.mode("overwrite").parquet(base)
    val before = fingerprint(spark.read.parquet(base).collect())
    // compact() rewrites the table through its own write jobs; retries
    // there are exercised by the sink test above — here the table the
    // compaction produced is re-read through a retried final stage and
    // must carry exactly the pre-compaction content
    graft.io.Maintenance.compact(spark, base, Nil, targetBytes = 8L * 1024 * 1024)
    val after = fingerprint(injectRetry(spark.read.parquet(base)).collect())
    assert(after == before, "compaction content differs under retried re-read")
  }

  test("flagship + top-k + sketch queries survive a retried final stage") {
    for (name <- Seq("pipe_mart", "o2_topk", "a6_kmv_distinct", "tx_shard_shuffle")) {
      val df = SparkEntry.queries(name)(spark, sf)
      assertRetryStable(name, df)
    }
  }
}
