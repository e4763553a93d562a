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

  test("writeZOrdered: BOTH clustered dimensions prune; linear clustering only one") {
    val dir = Files.createTempDirectory("layout_z").toFile
    // 2-D uniform grid, shuffled insert order
    val grid = scala.util.Random.shuffle(
      (for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)).toList)
      .toDF("x", "y")

    val zPath = s"$dir/zordered"
    Layout.writeZOrdered(grid, zPath, numFiles = 16,
      clusterCols = Seq("x", "y"), bits = 8)
    val linPath = s"$dir/linear"
    Layout.writeRangeClustered(grid, linPath, numFiles = 16,
      clusterCols = Seq("x"))

    // the Z-address column is layout-only — not in the written schema
    assert(spark.read.parquet(zPath).columns.sorted.sameElements(Array("x", "y")))
    assert(spark.read.parquet(zPath).count() == 256L * 256L)

    // a narrow x-slice: both layouts prune (z less tightly — its files
    // are squares, not x-stripes)
    val zx = Layout.touchedFileFraction(spark, zPath, "x", lit(60L), lit(70L))
    val lx = Layout.touchedFileFraction(spark, linPath, "x", lit(60L), lit(70L))
    assert(lx <= 2.0 / 16.0, s"linear x fraction $lx")
    assert(zx <= 10.0 / 16.0, s"zorder x fraction $zx")

    // a narrow y-slice: the linear layout reads EVERYTHING (every
    // x-stripe spans all y); the Z-order layout skips most files
    val zy = Layout.touchedFileFraction(spark, zPath, "y", lit(60L), lit(70L))
    val ly = Layout.touchedFileFraction(spark, linPath, "y", lit(60L), lit(70L))
    assert(ly == 1.0, s"linear y fraction $ly")
    assert(zy <= 10.0 / 16.0, s"zorder y fraction $zy")
  }

  test("zAddress: bounded, deterministic, constant-column and negative-value safe") {
    // adversarial domains: negatives, a constant column (hi == lo must
    // not divide by zero), values at both bounds (no ANSI overflow on
    // the cast — the bucket is clamped BEFORE casting)
    val df = Seq((-50L, 7.5), (0L, 7.5), (999L, 7.5), (-50L, 7.5))
      .toDF("a", "b")
    val z = Layout.zAddress(df, Seq("a", "b"), bits = 10)
      .select(col("a"), col("b"), col(Layout.ZCol))
      .as[(Long, Double, Long)].collect()
    val max = 1L << (2 * 10)
    z.foreach { case (_, _, addr) =>
      assert(addr >= 0 && addr < max, s"address $addr out of [0, $max)")
    }
    // same input row → same address (the layout must be reproducible)
    val byRow = z.groupBy(r => (r._1, r._2)).values
    byRow.foreach(g => assert(g.map(_._3).distinct.length == 1))
    // extremes land at opposite ends of the curve
    val lo = z.find(_._1 == -50L).get._3
    val hi = z.find(_._1 == 999L).get._3
    assert(lo < hi)
  }

  test("withHilbertAddress: bijective, CONTINUOUS (Manhattan-adjacent steps), locality beats Z") {
    // full 32×32 grid at order 5
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    val d = Layout.withHilbertAddress(grid, col("x"), col("y"), order = 5, outCol = "hd")
      .select($"hd", $"x", $"y").as[(Long, Long, Long)].collect().sortBy(_._1)
    // bijection onto [0, 1024)
    assert(d.map(_._1).toSeq == (0L until 1024L))
    // THE Hilbert property Z-order lacks: consecutive addresses are
    // Manhattan-adjacent cells (the curve never teleports)
    d.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at ($x1,$y1)→($x2,$y2)")
    }
    // known order-1 quadrant walk: (0,0)→(0,1)→(1,1)→(1,0)
    val o1 = Layout.withHilbertAddress(
        Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y"),
        col("x"), col("y"), order = 1, outCol = "hd")
      .select($"x", $"y", $"hd").as[(Long, Long, Long)].collect()
      .map { case (a, b, c) => ((a, b), c) }.toMap
    assert(o1 == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L, (1L, 1L) -> 2L, (1L, 0L) -> 3L))
  }

  test("writeHilbertOrdered: both dimensions prune via compact per-file regions") {
    val dir = Files.createTempDirectory("layout_h").toFile
    val grid = scala.util.Random.shuffle(
      (for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)).toList)
      .toDF("x", "y")
    val hPath = s"$dir/hilbert"
    Layout.writeHilbertOrdered(grid, hPath, numFiles = 16,
      xCol = col("x"), yCol = col("y"), order = 8)
    // address column is layout-only; content preserved
    assert(spark.read.parquet(hPath).columns.sorted.sameElements(Array("x", "y")))
    assert(spark.read.parquet(hPath).count() == 256L * 256L)
    // narrow slices in EITHER dimension skip most files (files cover
    // compact curve segments ⇒ compact 2-D regions)
    val hx = Layout.touchedFileFraction(spark, hPath, "x", lit(60L), lit(70L))
    val hy = Layout.touchedFileFraction(spark, hPath, "y", lit(60L), lit(70L))
    assert(hx <= 8.0 / 16.0, s"hilbert x fraction $hx")
    assert(hy <= 8.0 / 16.0, s"hilbert y fraction $hy")
  }

  test("writeWithBloom: every row group carries the bloom; plain write doesn't; reads agree") {
    val dir = Files.createTempDirectory("layout_bloom").toFile
    val df = (0L until 20000L).toDF("user_id")
      .withColumn("payload", col("user_id") * 13 % 997)
    val bloomed = s"$dir/bloomed"
    Layout.writeWithBloom(df.repartition(4), bloomed,
      bloomCols = Seq("user_id"), ndv = 20000L)
    assert(Layout.hasBloomFilter(spark, bloomed, "user_id"))
    assert(!Layout.hasBloomFilter(spark, bloomed, "payload"))
    val plain = s"$dir/plain"
    df.repartition(4).write.parquet(plain)
    assert(!Layout.hasBloomFilter(spark, plain, "user_id"))
    // point lookups through the bloomed layout return the same rows
    val got = spark.read.parquet(bloomed)
      .filter(col("user_id").isin(5L, 19999L, 123456L))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((5L, 65L), (19999L, 19999L * 13 % 997)))
  }
}
