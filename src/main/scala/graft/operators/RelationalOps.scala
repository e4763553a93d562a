package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators re-expressing the reference's transform
  * surface (SURVEY §2) as composable `DataFrame => DataFrame` functions.
  *
  * Each operator is declarative (Catalyst-optimizable): no collect-loops,
  * no UDFs, codegen-friendly expressions only.
  */
object RelationalOps {

  /** W1 — window-function dedup, "keep first occurrence per key".
    *
    * Reference: `glue_jobs/process_openaq_raw.py:129-135` — its window
    * orders by the partition key itself, making the kept row arbitrary.
    * We require an explicit deterministic tie-break ordering instead
    * (SURVEY §7.4-2), so results are oracle-checkable.
    *
    * One shuffle on `keys`. At 100 TB: the shuffle is unavoidable for a
    * global dedup, but if the input is already bucketed/partitioned by
    * the key, Catalyst elides the exchange.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** P7 — cheaper dedup when ANY row per key is acceptable: hash-based
    * partial aggregation (map-side combine) instead of a full sort
    * window. Preferred at scale when tie-breaking is not required.
    */
  def dedupAny(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** A1 — long→wide pivot with a PINNED value list
    * (`process_openaq_raw.py:151-159`; pinning per SURVEY §7.4-1: avoids
    * the extra distinct-scan job and keeps the output schema stable).
    * `avg` absorbs residual duplicates exactly like the reference's
    * `mean`.
    */
  def pivotAvg(df: DataFrame, groupCols: Seq[String], pivotCol: String,
               pivotValues: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, pivotValues)
      .agg(avg(col(valueCol)))

  /** J1/J2 — enrich facts with a small dimension via broadcast hash join
    * (`process_openaq_raw.py:188-192`). The dim is deduplicated first so
    * the join can never fan out (`:185`). Broadcast ⇒ no shuffle of the
    * (huge) fact side — the 100 TB-safe join shape for dims.
    */
  def enrich(facts: DataFrame, dim: DataFrame, key: String,
             joinType: String = "left"): DataFrame =
    facts.join(broadcast(dim.dropDuplicates(key)), Seq(key), joinType)

  /** P8 — null defaulting (`process_openaq_raw.py:195-198`). */
  def fillDefaults(df: DataFrame, stringDefaults: Map[String, String],
                   numericDefaults: Map[String, Double]): DataFrame =
    df.na.fill(stringDefaults).na.fill(numericDefaults)

  /** A3 — single-pass null audit: one row, one column per audited input
    * column holding its null count (`process_openaq_raw.py:228-231`).
    */
  def nullAudit(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => count(when(col(c).isNull, 1)).as(c)): _*)

  /** O1/O2 — top-k by a metric: Catalyst plans this as
    * TakeOrderedAndProject (no global sort materialization).
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)
}
