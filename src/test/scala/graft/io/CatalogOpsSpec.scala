package graft.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The reference's serve-time catalog contract
  * (crawler → partitioned table → SHOW PARTITIONS/DESCRIBE/listing →
  * partition-pruned SQL) against the session catalog.
  */
class CatalogOpsSpec extends SparkSpec {
  import spark.implicits._

  private def sampleDf = Seq(
    (1L, 10.0, "2024", "01"), (2L, 20.0, "2024", "01"),
    (3L, 30.0, "2024", "02"), (4L, 40.0, "2025", "01")
  ).toDF("id", "v", "year", "month")

  test("managed partitioned table: saveAsTable tracks partitions; SHOW PARTITIONS parses") {
    CatalogOps.saveAsPartitionedTable(sampleDf, "cat_managed", Seq("year", "month"))
    val parts = CatalogOps.partitions(spark, "cat_managed", Seq("year", "month"))
      .as[(String, String)].collect().toSet
    assert(parts == Set(("2024", "01"), ("2024", "02"), ("2025", "01")))
    assert(CatalogOps.tableNames(spark).contains("cat_managed"))
    assert(spark.table("cat_managed").count() == 4)
  }

  test("external table: MSCK recovers partitions from a hive layout, including late arrivals") {
    val dir = Files.createTempDirectory("cat_ext").toString
    sampleDf.write.mode("overwrite").partitionBy("year", "month").parquet(dir)
    CatalogOps.registerExternalPartitioned(spark, "cat_ext", dir,
      sampleDf.schema, Seq("year", "month"))
    assert(CatalogOps.partitions(spark, "cat_ext", Seq("year", "month")).count() == 3)
    assert(spark.table("cat_ext").count() == 4)

    // late-arriving partition directory: invisible until re-crawled
    Seq((5L, 50.0)).toDF("id", "v").write
      .parquet(s"$dir/year=2025/month=02")
    spark.sql("MSCK REPAIR TABLE cat_ext")
    assert(CatalogOps.partitions(spark, "cat_ext", Seq("year", "month")).count() == 4)
    assert(spark.table("cat_ext").count() == 5)
  }

  test("DESCRIBE exposes partition metadata") {
    CatalogOps.saveAsPartitionedTable(sampleDf, "cat_desc", Seq("year", "month"))
    val desc = CatalogOps.describeTable(spark, "cat_desc")
      .select("col_name").as[String].collect().toSeq
    assert(desc.contains("# Partition Information"))
    assert(desc.count(_ == "year") == 2) // data column + partition listing
  }

  test("partition filter prunes the scan of a cataloged table") {
    val dir = Files.createTempDirectory("cat_prune").toString
    sampleDf.write.mode("overwrite").partitionBy("year", "month").parquet(dir)
    CatalogOps.registerExternalPartitioned(spark, "cat_prune", dir,
      sampleDf.schema, Seq("year", "month"))
    val q = spark.sql("SELECT sum(v) FROM cat_prune WHERE year = '2024' AND month = '01'")
    assert(q.head().getDouble(0) == 30.0)
    val root = q.queryExecution.executedPlan
    val unwrapped = root.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
    } match { case Seq() => Seq(root); case r => r }
    val scans = unwrapped.flatMap(_.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    })
    assert(scans.nonEmpty)
    // only the one matching partition's files are read
    assert(scans.head.relation.location.inputFiles.length >= 1)
    val selected = scans.head.metadata.get("PartitionFilters")
    assert(selected.exists(s => s.contains("year") && s.contains("month")),
      s"expected partition filters in scan metadata: ${scans.head.metadata}")
  }

  test("co-bucketed tables join with ZERO shuffle; unbucketed twin shuffles both sides") {
    val facts = (0L until 1000L).map(i => (i % 100, i, i * 2.0))
      .toDF("custkey", "orderkey", "amount")
    val dims = (0L until 100L).map(i => (i, s"cust$i")).toDF("custkey", "name")
    CatalogOps.saveAsBucketedTable(facts, "bkt_orders", "custkey", nBuckets = 8)
    CatalogOps.saveAsBucketedTable(dims, "bkt_cust", "custkey", nBuckets = 8)

    def shuffles(q: org.apache.spark.sql.DataFrame): Int = {
      q.collect() // finalize the adaptive plan
      // AQE hides exchanges inside materialized query stages (not plan
      // children), so count them in the final plan's rendering
      "Exchange hashpartitioning".r
        .findAllIn(q.queryExecution.executedPlan.toString).length
    }

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table("bkt_orders")
        .join(spark.table("bkt_cust"), "custkey")
        .groupBy("custkey").agg(max("name").as("name"), sum("amount").as("total"))
      // join AND aggregation ride the bucket partitioning: no exchange at all
      assert(shuffles(bucketed) == 0,
        s"bucketed join+agg must be shuffle-free:\n${bucketed.queryExecution.executedPlan}")

      val plain = facts.join(dims, "custkey")
        .groupBy("custkey").agg(max("name").as("name"), sum("amount").as("total"))
      assert(shuffles(plain) >= 2, "the unbucketed twin must shuffle both join sides")

      assert(bucketed.collect().toSet == plain.collect().toSet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ANALYZE TABLE: row-count statistics become optimizer-visible") {
    // rowCount propagates into plan stats under the cost-based optimizer
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      CatalogOps.saveAsPartitionedTable(sampleDf, "cat_stats", Seq("year", "month"))
      val (_, before) = CatalogOps.tableStats(spark, "cat_stats")
      assert(before.isEmpty, s"expected no rowCount before ANALYZE, got $before")
      CatalogOps.analyzeTable(spark, "cat_stats", columns = Seq("id", "v"))
      val (size, after) = CatalogOps.tableStats(spark, "cat_stats")
      assert(after.contains(BigInt(4)), s"rowCount after ANALYZE: $after")
      assert(size > 0)
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
    // column NDVs recorded (CBO join-reorder inputs)
    val ndv = spark.sql("DESCRIBE EXTENDED cat_stats id")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(ndv.get("distinct_count").exists(_.trim == "4"), s"got $ndv")
  }
}
