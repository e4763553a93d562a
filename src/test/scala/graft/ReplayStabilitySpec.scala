package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, count, lit, sum}

/** Replay determinism as a regression test: every `SparkEntry.queries`
  * entry executed TWICE in one session must produce the identical
  * result multiset. This is the class of bug the compaction
  * nondeterministic-salt fix (io/Maintenance.scala) proved live —
  * `monotonically_increasing_id`/`rand`-derived values differ across
  * runs and task retries, so a query carrying one silently yields
  * different marts on replay (and different results under speculative
  * execution on a cluster).
  *
  * Two layers:
  *   1. behavioral — order-insensitive result fingerprint (count +
  *      sum of per-row xxhash64 over the canonical JSON encoding)
  *      equal across back-to-back runs;
  *   2. structural — no physical plan may contain a nondeterministic
  *      expression (rand/randn/uuid/monotonically_increasing_id/
  *      spark_partition_id/current_timestamp-family) outside the
  *      documented exemption list below.
  *
  * Runs at sf0.001: replay stability is scale-invariant, and the
  * behavioral layer executes every query twice.
  */
class ReplayStabilitySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Order-insensitive multiset fingerprint. Sum (not xor) of row
    * hashes so duplicated rows are not self-cancelling — summed in
    * DECIMAL(38,0) because a Long sum of 64-bit hashes overflows (an
    * ANSI-mode error, not a wraparound); to_json gives a canonical
    * text encoding for nested arrays/structs/binary (base64) that
    * Row.toString does not (Array[Byte] stringifies by object
    * identity).
    */
  private def fingerprint(df: DataFrame): (String, Long) = {
    val r = df.selectExpr(
        "CAST(xxhash64(to_json(struct(*))) AS DECIMAL(38,0)) AS __h")
      .agg(coalesce(sum("__h"), lit(0)).cast("decimal(38,0)").as("s"),
        count(lit(1)).as("n"))
      .collect()(0)
    (String.valueOf(r.get(0)), r.getLong(1))
  }

  test("every query is replay-stable (same fingerprint twice in one session)") {
    val diffs = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      try {
        val a = fingerprint(SparkEntry.queries(name)(spark, dir))
        val b = fingerprint(SparkEntry.queries(name)(spark, dir))
        if (a == b) None else Some(s"$name: run1=$a run2=$b")
      } catch {
        case e: Throwable => Some(s"$name: FAILED ${e.getMessage}")
      }
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  // Queries whose plan legitimately carries a flagged token. Each
  // entry must name WHY; an undocumented appearance anywhere else
  // fails the sweep.
  private val documented: Map[String, String] = Map(
    // dq_freshness anchors "now" to a DETERMINISTIC literal derived
    // from the data's max timestamp — the plan still prints the
    // anchor expression name in some Spark versions. (Kept in the map
    // only if it trips; see assertion message.)
  )

  private val needle =
    """(?i)\b(rand|randn|uuid|shuffle|monotonically_increasing_id|spark_partition_id)\(""".r

  test("no physical plan carries an undocumented nondeterministic expression") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(documented.contains)
      .flatMap { name =>
        try {
          val s = SparkEntry.queries(name)(spark, dir)
            .queryExecution.executedPlan.toString
          needle.findFirstIn(s).map(tok => s"$name: contains $tok")
        } catch {
          case e: Throwable => Some(s"$name: PLAN FAILED ${e.getMessage}")
        }
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
