package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Runtime scan-reduction rewrites — the two Catalyst mechanisms that
  * shrink a 100 TB fact scan using information that only exists at run
  * time (the filtered dim side of a join):
  *
  *  - DYNAMIC PARTITION PRUNING: a `dynamicpruning` subquery lands in
  *    the partitioned fact scan's PartitionFilters, so only the
  *    partitions whose keys survive the dim filter are listed/read.
  *  - RUNTIME BLOOM FILTER: for a shuffle join, a bloom filter built
  *    from the filtered build-side keys is applied to the fact rows
  *    BEFORE the shuffle (`might_contain`), cutting exchange volume to
  *    the joinable fraction.
  *
  * Both are asserted on plan SHAPE here; the answer itself is
  * DuckDB-oracled by `k9_dpp` / `j8_bloom_join`.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("join to a filtered dim dynamically prunes fact partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft_dpp_spec").toString
    val fact = (1 to 10000).map(i => (i.toLong, i % 20, i * 1.5))
      .toDF("id", "part_key", "v")
    fact.write.mode("overwrite").partitionBy("part_key").parquet(s"$out/fact")
    // dim must be a SCANNED relation: a LocalRelation would constant-
    // fold the filter away and DPP sees no selective predicate
    (0 until 20).map(i => (i, if (i < 3) "keep" else "drop"))
      .toDF("d_key", "d_tag")
      .write.mode("overwrite").parquet(s"$out/dim")
    val dim = spark.read.parquet(s"$out/dim")

    val readBack = spark.read.schema(fact.schema).parquet(s"$out/fact")
    val joined = readBack
      .join(dim.filter($"d_tag" === "keep"), $"part_key" === $"d_key")
    assert(joined.queryExecution.optimizedPlan.toString.contains("dynamicpruning"),
      s"expected dynamicpruning in:\n${joined.queryExecution.optimizedPlan}")
    // 3 of 20 partitions survive: part_key 0, 1, 2 → 500 rows each
    assert(joined.count() == 1500)
  }

  test("selective shuffle join injects a bloom filter on the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
      // the injector only fires for joins that CANNOT broadcast by
      // size (a broadcast join needs no runtime filter) — at test
      // scale that means disabling auto-broadcast, the same plan shape
      // a 100 TB build side produces naturally
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = java.nio.file.Files.createTempDirectory("graft_bloom_spec").toString
      (1 to 50000).map(i => (i.toLong % 1000, s"payload_$i"))
        .toDF("k", "v").write.mode("overwrite").parquet(s"$out/fact")
      (1L to 1000L).map(k => (k, if (k % 50 == 0) "hot" else "cold"))
        .toDF("k", "tag").write.mode("overwrite").parquet(s"$out/dim")

      val fact = spark.read.parquet(s"$out/fact")
      val dim = spark.read.parquet(s"$out/dim").filter($"tag" === "hot")
      val joined = fact.join(dim, "k")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom-filter runtime filter in:\n$plan")
      // hot keys 50,100,…,1000; fact key domain is 0..999 → 19 match
      assert(joined.count() == 19 * 50)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
