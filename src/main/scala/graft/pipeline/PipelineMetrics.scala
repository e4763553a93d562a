package graft.pipeline

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Zero-extra-scan pipeline telemetry.
  *
  * The reference forces 5 extra Spark jobs with stage-by-stage
  * `df.count()` calls (`process_openaq_raw.py:101,137,161,200`;
  * SURVEY §3.2). Here the same numbers ride along the ONE real job:
  *
  *  - `observed(df, name)` attaches a `Dataset.observe` aggregate
  *    (rows, null-count columns) evaluated during the action itself;
  *  - [[MetricsListener]] collects every observation via
  *    `QueryExecutionListener` after each action completes.
  */
object PipelineMetrics {

  /** Attach a named row-count (+ optional per-column null counts)
    * observation to a stage. Costs nothing extra at runtime — the
    * aggregates are computed inside the already-running stages.
    */
  def observed(df: DataFrame, name: String, nullCols: Seq[String] = Nil): DataFrame = {
    val metrics = count(lit(1)).as("rows") +:
      nullCols.map(c => count(when(col(c).isNull, 1)).as(s"null_$c"))
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Collects observation results keyed by observation name. */
  final class MetricsListener extends QueryExecutionListener {
    val collected: TrieMap[String, Map[String, Long]] = TrieMap.empty

    private def harvest(qe: QueryExecution): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        // the listener sees EVERY session observation, not just ours —
        // a null or non-numeric metric (avg over an empty frame, a
        // string-valued observe elsewhere) must be skipped, not NPE the
        // harvest and lose this query's other metrics with it
        collected(name) = row.schema.fieldNames.flatMap { f =>
          row.getAs[Any](f) match {
            case n: Number => Some(f -> n.longValue())
            case _ => None
          }
        }.toMap
      }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      harvest(qe)
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      harvest(qe)
  }

  /** Register a fresh listener on the session and return it. */
  def attach(spark: org.apache.spark.sql.SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}
