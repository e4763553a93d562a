package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** The `ann_ivf_pq` gate row at an arbitrary decade tier — SAME laws
  * (candK = max(100, min(n/10, 20√n)), geometry =
  * `SimilarityOps.ivfPqGeometry` = (min(n/4, 4√n) cells, half-mass
  * nprobe), train sample ≥ 32 points/centroid), with the build/search
  * split timed and recall measured against the brute-force twin on
  * the gate's 64-query modulus sample. This is the instrument for the
  * 20M-vector tier (the third embedding decade): the gate pins
  * recall ≥ 0.9 at sf0.01/sf0.1; this prints the same boolean where
  * the index is 10⁴× the gate's corpus.
  *
  * One JSON line:
  *   {"probe":"ivfpq_decade","n":…,"cells":…,"nprobe":…,"candk":…,
  *    "build_sec":…,"search_sec":…,"twin_sec":…,"recall":…,
  *    "recall_ok":…}
  *
  * Usage: SPARK_DRIVER_MEM=24g tools/run_main.sh \
  *          graft.tools.IvfPqDecadeProbe /tmp/stress/sf10000emb
  */
object IvfPqDecadeProbe {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/stress/sf1000emb"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftExtensions.assertWired(spark)
    spark.sparkContext.setLogLevel("WARN")
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val (dim, m, ksub) = (64, 16, 32)
    // see AssignProbe: measure the loop, not the stress set's file
    // count — a cluster scan is thousands of splits
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .repartition(cpus.toInt).localCheckpoint()
    val n = emb.count()
    val sample = emb.filter(
      col("vec_id") % SimilarityOps.sampleModulus(n, 64) === 0)

    // the gate row's laws, verbatim (SimQueries.scala ann_ivf_pq)
    val candK = math.max(100, math.min(n / 10,
      20L * math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
    val (nCells, nprobe) = SimilarityOps.ivfPqGeometry(n)
    val tsMod = SimilarityOps.sampleModulus(n, math.max(512, 32 * nCells))
    val trainSample = if (tsMod <= 1) None
      else Some(emb.filter(col("vec_id") % tsMod === 0))

    val t0 = System.nanoTime()
    val (cents, codebook, codes0) = SimilarityOps.buildIvfPq(
      emb, "vec_id", "embedding", dim, m, ksub, nCells, trainSample)
    val codebookCk = codebook.localCheckpoint()
    val codes = codes0.localCheckpoint()
    val nCoded = codes.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    require(nCoded == n, s"index build dropped rows: $nCoded of $n")

    val t1 = System.nanoTime()
    val got = SimilarityOps.ivfPqSearch(sample, emb, "vec_id", "embedding",
        dim, m, ksub, cents, codebookCk, codes, nprobe, candK, k = 5)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      .localCheckpoint()
    got.count()
    val searchSec = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val exact = SimilarityOps.bruteForceTopK(sample, emb, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val nExact = exact.count()
    val twinSec = (System.nanoTime() - t2) / 1e9

    val hits = exact.join(got, Seq("query_id", "neighbor_id"), "left")
      .agg(sum(coalesce(col("hit"), lit(0)))).collect()(0).getLong(0)
    val recall = hits.toDouble / nExact
    println(s"""{"probe":"ivfpq_decade","dir":"$dir","n":$n,""" +
      s""""cells":$nCells,"nprobe":$nprobe,"candk":$candK,""" +
      s""""build_sec":${r3(buildSec)},"search_sec":${r3(searchSec)},""" +
      s""""twin_sec":${r3(twinSec)},"n_exact":$nExact,""" +
      s""""recall":${r3(recall)},"recall_ok":${recall >= 0.9}}""")
    spark.stop()
  }
}
