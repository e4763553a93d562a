package graft.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compact: many small files -> few files, identical content, layout kept") {
    val path = Files.createTempDirectory("compact").toString + "/t"
    val df = (1 to 5000).map(i => (i.toLong, s"p${i % 2}", i * 1.5)).toDF("id", "part", "v")
    // simulate the reference's incremental small-file writes
    df.repartition(40).write.partitionBy("part").parquet(path)
    val before = Maintenance.dataFiles(path).length
    assert(before >= 60, s"expected many small files, got $before")
    val sumBefore = spark.read.parquet(path).agg(sum("id")).head().getLong(0)

    Maintenance.compact(spark, path, Seq("part"), targetBytes = 512L * 1024 * 1024)

    val after = Maintenance.dataFiles(path).length
    assert(after <= 2, s"expected ~1 file per partition, got $after")
    val re = spark.read.parquet(path)
    assert(re.agg(sum("id")).head().getLong(0) == sumBefore)
    assert(re.select("part").distinct().count() == 2) // partition col survives
    assert(new java.io.File(path + "/part=p0").isDirectory)
  }

  test("compact: an OVERSIZED partition splits into multiple target-size files") {
    val path = Files.createTempDirectory("compact_big").toString + "/t"
    // one big partition + one small one; tiny target forces a split
    val df = (1 to 20000).map(i =>
      (i.toLong, if (i <= 19000) "big" else "small",
        s"payload-$i-${"x" * 50}")).toDF("id", "part", "v")
    df.repartition(4).write.partitionBy("part").parquet(path)
    val sumBefore = spark.read.parquet(path).agg(sum("id")).head().getLong(0)
    val bigBytes = Maintenance.dataFiles(path)
      .filter(_.getPath.contains("part=big")).map(_.length).sum

    Maintenance.compact(spark, path, Seq("part"), targetBytes = bigBytes / 3)

    // budget = ceil(bytes/target) ≥ 3 for big; small stays at 1 file —
    // per-partition sizing, not one-file-per-partition or global spray
    val bigFiles = Maintenance.dataFiles(path).count(_.getPath.contains("part=big"))
    val smallFiles = Maintenance.dataFiles(path).count(_.getPath.contains("part=small"))
    assert(bigFiles >= 3, s"oversized partition not split: $bigFiles files")
    assert(smallFiles == 1, s"small partition should stay single-file: $smallFiles")
    assert(spark.read.parquet(path).agg(sum("id")).head().getLong(0) == sumBefore)
  }

  test("compact: hive-escaped partition values FAIL LOUDLY, source left intact") {
    val path = Files.createTempDirectory("compact_esc").toString + "/t"
    // ':' hive-escapes to %3A in the dir name; the read-back value no
    // longer round-trips as the literal dir string, so the budget join
    // cannot match — compact must raise, not silently drop those rows
    val df = Seq((1L, "a:b", 1.0), (2L, "plain", 2.0)).toDF("id", "part", "v")
    df.write.partitionBy("part").parquet(path)
    val before = spark.read.parquet(path).collect().toSet
    val e = intercept[Exception] {
      Maintenance.compact(spark, path, Seq("part"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("does not round-trip")),
      s"expected the loud compact error, got: $e")
    // destructive rewrite must NOT have happened
    assert(spark.read.parquet(path).collect().toSet == before)
  }

  // NOTE: the dataCols.isEmpty constant-salt branch in compact() is a
  // defensive guard only — Spark's own writer refuses a table whose
  // columns are ALL partition columns (ALL_PARTITION_COLUMNS_NOT_ALLOWED),
  // so such a layout can only arrive from an external writer and is not
  // constructible in a spec through the supported write path.
}
