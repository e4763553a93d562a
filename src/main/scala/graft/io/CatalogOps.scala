package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Persistent-catalog surface — the reference's serve-time contract is
  * a cataloged partitioned table queried via `DESCRIBE`,
  * `SHOW PARTITIONS` and table listings (crawler semantics:
  * `/root/reference/doc/architecture.md:249-264`, query surface
  * `utils/athena_utils.py:219-223`,
  * `tests/test_phase5_manual_trigger.py:269-288`). Spark-native
  * equivalents: datasource tables in the session catalog, partition
  * recovery (`MSCK REPAIR TABLE` — the crawler re-expressed as one
  * metadata command), `spark.catalog` introspection.
  *
  * At 100 TB the payoff is partition pruning from table metadata:
  * a query with `WHERE year='2025' AND month='07'` against a cataloged
  * table plans a scan of just that directory, no file listing of the
  * other ~1000 partitions.
  */
object CatalogOps {

  /** Managed partitioned table: write + register in one step
    * (`saveAsTable`); partitions are tracked in the catalog as they
    * are written.
    */
  def saveAsPartitionedTable(df: DataFrame, name: String,
                             partitionCols: Seq[String],
                             mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*)
      .format("parquet").saveAsTable(name)

  /** External partitioned table over an existing hive-layout directory
    * (the reference's crawl-then-query flow): declare the full schema,
    * point LOCATION at the data, then RECOVER the partitions from the
    * directory structure — the Glue-crawler step as one command.
    */
  def registerExternalPartitioned(spark: SparkSession, name: String,
                                  path: String, schema: StructType,
                                  partitionCols: Seq[String]): Unit = {
    val partSet = partitionCols.toSet
    val dataDdl = StructType(schema.filterNot(f => partSet(f.name))).toDDL
    val partDdl = partitionCols
      .map(c => s"$c ${schema(c).dataType.sql}").mkString(", ")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"""CREATE TABLE $name ($dataDdl, $partDdl)
         |USING PARQUET
         |PARTITIONED BY (${partitionCols.mkString(", ")})
         |LOCATION '$path'""".stripMargin)
    spark.sql(s"MSCK REPAIR TABLE $name")
  }

  /** Bucketed managed table: pays the shuffle ONCE at write time —
    * every subsequent equi-join or aggregation on `bucketCol` between
    * tables sharing the bucket count reads co-located buckets and
    * plans NO exchange (spec-asserted). This is the 100 TB answer for
    * a fact table joined on the same key every day: at 1000 executors
    * the repeated join shuffle is the bottleneck bucketing deletes.
    * `sortBy` additionally pre-sorts each bucket file so single-file
    * buckets skip the merge-join sort.
    */
  def saveAsBucketedTable(df: DataFrame, name: String, bucketCol: String,
                          nBuckets: Int,
                          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(name)

  /** `SHOW PARTITIONS`, parsed from `k1=v1/k2=v2` strings into one
    * typed column per partition key (the reference's
    * `get_partitions`).
    */
  def partitions(spark: SparkSession, name: String,
                 partitionCols: Seq[String]): DataFrame = {
    val listed = spark.sql(s"SHOW PARTITIONS $name")
    partitionCols.zipWithIndex.foldLeft(listed) { case (df, (c, i)) =>
      // anchor at a segment start: unanchored `c=(...)` would match a
      // key that is a SUFFIX of another (uid=42/id=7 → "id" hits
      // "uid=42"); group 2 is the value. SHOW PARTITIONS prints values
      // hive-ESCAPED (':' → %3A etc.) — url_decode restores the actual
      // value; a literal '+' is pre-protected because url_decode would
      // otherwise read it as an encoded space (hive never escapes '+').
      df.withColumn(c, url_decode(regexp_replace(
        regexp_extract(col("partition"), s"(^|/)$c=([^/]*)", 2),
        "\\+", "%2B")))
    }.select(partitionCols.map(col): _*)
  }

  /** Column name/type/comment rows — `DESCRIBE TABLE` as data. */
  def describeTable(spark: SparkSession, name: String): DataFrame =
    spark.sql(s"DESCRIBE TABLE $name")

  /** Catalog listing (the `information_schema.tables` surface). */
  def tableNames(spark: SparkSession, db: String = "default"): Seq[String] =
    spark.catalog.listTables(db).collect().map(_.name).toSeq.sorted

  /** Compute table- and column-level statistics (`ANALYZE TABLE`) —
    * what the cost-based optimizer needs for join reordering and
    * build-side selection on cataloged tables. At 100 TB this is the
    * difference between a size-guessed plan and one that knows row
    * counts and NDVs per column; run it after large writes, like the
    * reference schedules its crawler after loads.
    */
  def analyzeTable(spark: SparkSession, name: String,
                   columns: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR COLUMNS ${columns.mkString(", ")}")
  }

  /** The optimizer-visible statistics of a cataloged table:
    * (sizeInBytes, rowCount if analyzed).
    */
  def tableStats(spark: SparkSession, name: String): (BigInt, Option[BigInt]) = {
    val stats = spark.table(name).queryExecution.optimizedPlan.stats
    (stats.sizeInBytes, stats.rowCount)
  }
}
