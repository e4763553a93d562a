package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning — the write-side half of
  * "filters reach the parquet scan".
  *
  * Parquet footers carry per-column min/max for every file and row
  * group; the reader skips units whose range can't match a pushed
  * predicate. That only pays off if the writer CLUSTERS values: after
  * a random-ordered write every file spans the whole key domain and
  * nothing is skippable. `writeRangeClustered` makes the layout
  * prunable: a range repartition (sampled range exchange — the same
  * mechanism as a global sort, minus the local sort when not asked
  * for) puts disjoint key ranges in disjoint files, so a point or
  * range predicate touches O(1) of them instead of all. At 100 TB the
  * difference is reading gigabytes instead of the corpus.
  *
  * Mirrors the layout levers large tables actually use (cf. Delta/
  * Iceberg OPTIMIZE ... ZORDER/sort): cluster by the dominant filter
  * column(s); secondary `sortCols` additionally order rows WITHIN each
  * file so row-group stats subdivide the primary ranges.
  */
object Layout {

  /** Range-cluster `df` on `clusterCols` into `numFiles` files and
    * write parquet at `path`. Rows are additionally sorted within each
    * partition by `clusterCols ++ sortCols` to tighten row-group
    * stats. One sampled range exchange — no global sort barrier.
    */
  def writeRangeClustered(df: DataFrame, path: String, numFiles: Int,
                          clusterCols: Seq[String],
                          sortCols: Seq[String] = Nil): Unit = {
    val cluster = clusterCols.map(col)
    df.repartitionByRange(numFiles, cluster: _*)
      .sortWithinPartitions(cluster ++ sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max of `keyCol` as seen by a reader of `path` —
    * the footer stats a pruning scan consults, reconstructed
    * relationally (one scan, no driver loops). Used to VERIFY a
    * layout: clustered ⇒ file ranges are (near-)disjoint.
    */
  def fileRanges(spark: SparkSession, path: String, keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"),
        count(lit(1)).as("n_rows"))

  /** Fraction of files a reader must touch for an equality/range
    * predicate `lo ≤ key ≤ hi`, given the layout at `path` — the
    * measurable pruning win (1.0 = unclustered, ~1/numFiles =
    * perfectly clustered).
    */
  def touchedFileFraction(spark: SparkSession, path: String, keyCol: String,
                          lo: Column, hi: Column): Double = {
    val ranges = fileRanges(spark, path, keyCol)
    val row = ranges.agg(
      sum(when(col("lo") <= hi && col("hi") >= lo, 1).otherwise(0)).as("touched"),
      count(lit(1)).as("total")).head()
    row.getLong(0).toDouble / row.getLong(1).toDouble
  }
}
