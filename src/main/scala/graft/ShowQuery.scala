package graft

import org.apache.spark.sql.SparkSession

/** Print a named query's result rows (truncated) — the quick pin
  * inspection loop for the boolean-bearing verification queries.
  *
  * Usage: sbt "runMain graft.ShowQuery <queryName> [sfDir] [maxRows]"
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val maxRows = if (args.length > 2) args(2).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir).show(maxRows, truncate = false)
    spark.stop()
  }
}
