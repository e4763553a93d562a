package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for one or more named queries to
  * per-query files — the before/after plan evidence the optimization
  * rounds commit under `plans/r13/`.
  *
  * Usage: sbt "runMain graft.tools.ExplainOne <outDir> <suffix> <query> [query...] [--sf <dir>]"
  * Writes `<outDir>/<query>_<suffix>.txt` for each query.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val (sfDir, queries) = {
      val i = args.indexOf("--sf")
      if (i >= 0) (args(i + 1), args.drop(2).take(i - 2).toSeq)
      else ("/root/testdata/sf0.1", args.drop(2).toSeq)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // no-fork local FS (graft.io.NioLocalFileSystem scaladoc): Hadoop's
      // shell-backed chmod/readlink forks a process per created file /
      // checkpoint rename when libhadoop is absent — java.nio instead
      .config("spark.hadoop.fs.file.impl", "graft.io.NioLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl", "graft.io.NioLocalFs")
      .getOrCreate()
    graft.GraftExtensions.assertWired(spark)
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    queries.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[explain] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
