package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Times the IVF coarse-assign pass ALONE — the O(n·nCells·dim) flop
  * wall the index build scales on — isolating it from the sample
  * train / PQ encode / join costs `IvfGridProbe` folds into build_sec.
  * Centroids come from one relational `centroids()` pass over a hash
  * seed (no Lloyd iterations: the assign cost is geometry-shaped, not
  * centroid-value-shaped), are checkpointed, and the timed region is
  * exactly `ivfAssign` + a count.
  *
  * Usage: sbt "runMain graft.tools.AssignProbe /tmp/stress/sf100emb 1792"
  */
object AssignProbe {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/stress/sf1"
    val nCells = if (args.length > 1) args(1).toInt else 1792
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftExtensions.assertWired(spark)
    spark.sparkContext.setLogLevel("WARN")
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    // repartition to the core count: the stress sets are written in a
    // handful of files and a map-only pass inherits scan splits — a
    // 50 MB table is 1–2 splits, serializing the flop wall onto 2 of
    // 32 cores. A cluster scan of the real corpus is thousands of
    // splits; the probe must measure the loop, not the file count.
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .repartition(cpus.toInt).localCheckpoint()
    val n = emb.count()
    val seed = emb.withColumn("cell",
      pmod(xxhash64(col("vec_id")), lit(nCells.toLong)).cast("int"))
    val cents = SimilarityOps.centroids(seed, "cell", "embedding")
      .localCheckpoint()
    cents.count()

    val t0 = System.nanoTime()
    val assigned = SimilarityOps.ivfAssign(emb, "vec_id", "embedding", cents)
    // an aggregate over the RESULT columns — a bare count() lets
    // column pruning drop the argmin projection entirely and times an
    // empty scan (measured 896 "G madds/s", i.e. nothing)
    val row = assigned.agg(count(lit(1)), sum(col("assigned_cell").cast("long")),
      sum(col("cos"))).collect()(0)
    val cnt = row.getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    val madds = n.toDouble * nCells * 64
    println(s"""{"probe":"assign","dir":"$dir","n":$n,"cells":$nCells,""" +
      s""""assigned":$cnt,"assign_sec":${r3(sec)},""" +
      s""""gmadds_per_sec":${r3(madds / sec / 1e9)}}""")
    spark.stop()
  }
}
