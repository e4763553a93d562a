package graft

import org.apache.spark.sql.SparkSession

/** Time a single named query (Bench methodology: warm run, then
  * min-of-3 timed runs) — the iterate-on-one-plan feedback loop.
  *
  * Usage: sbt "runMain graft.TimeQuery <queryName> [sfDir]"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions) // same engine Bench/Verify run
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
    spark.sparkContext.setLogLevel("WARN")

    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // codegen warm
    val best = (1 to 3).map(_ => once()).min
    val sec = String.format(java.util.Locale.ROOT, "%.3f", Double.box(best))
    println(s"""{"query":"$name","sec":$sec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
