package graft.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writeRangeClustered: disjoint per-file key ranges, prunable point lookups") {
    val dir = Files.createTempDirectory("layout").toFile
    val path = s"$dir/clustered"
    // shuffled insert order — the layout must come from the writer
    val df = scala.util.Random.shuffle((0L until 10000L).toList)
      .toDF("k").withColumn("payload", col("k") * 7)
    Layout.writeRangeClustered(df, path, numFiles = 8, clusterCols = Seq("k"))

    val ranges = Layout.fileRanges(spark, path, "k")
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length == 8)
    // ranges are pairwise disjoint and cover all rows
    ranges.sliding(2).foreach { case Array(a, b) => assert(a._3 < b._2) }
    assert(ranges.map(_._4).sum == 10000L)

    // a point/range predicate touches ~1 file instead of all 8
    val frac = Layout.touchedFileFraction(spark, path, "k", lit(4000L), lit(4100L))
    assert(frac <= 2.0 / 8.0, s"touched fraction $frac")

    // contrast: the unclustered layout is unprunable (every file spans
    // the domain, so every file is touched)
    val flat = s"$dir/flat"
    df.repartition(8).write.parquet(flat)
    val fracFlat = Layout.touchedFileFraction(spark, flat, "k", lit(4000L), lit(4100L))
    assert(fracFlat == 1.0, s"unclustered fraction $fracFlat")

    // and the pushed filter actually reads only matching files' rows:
    // count the distinct files contributing post-filter rows
    val touched = spark.read.parquet(path).filter(col("k").between(4000, 4100))
      .select(input_file_name()).distinct().count()
    assert(touched <= 2)
  }
}
