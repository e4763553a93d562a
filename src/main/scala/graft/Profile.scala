package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query profiler: runs one named query repeatedly after
  * a warmup so per-query timings are separable from session/JIT cost.
  *
  * Usage: sbt "runMain graft.Profile <query> [sfDir] [iters]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // no-fork local FS (graft.io.NioLocalFileSystem scaladoc): Hadoop's
      // shell-backed chmod/readlink forks a process per created file /
      // checkpoint rename when libhadoop is absent — java.nio instead
      .config("spark.hadoop.fs.file.impl", "graft.io.NioLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl", "graft.io.NioLocalFs")
      .getOrCreate()
    GraftExtensions.assertWired(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"PROFILE $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
