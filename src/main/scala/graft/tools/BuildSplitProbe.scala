package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Splits the IVF-PQ index-build wall into its stages — the grid
  * probe reports one build_sec; this answers WHICH stage pays it at a
  * given (n, nCells), so the decade projection multiplies the right
  * number: coarse train is O(sample·nCells), the corpus assign is
  * O(n·nCells), PQ train is O(sample·ksub), encode is O(n·ksub), and
  * the residue is the three id-joins assembling the coded corpus.
  *
  * Usage: sbt "runMain graft.tools.BuildSplitProbe /tmp/stress/sf100emb 1792"
  */
object BuildSplitProbe {

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
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (dim, m, ksub) = (64, 16, 32)
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .repartition(cpus.toInt).localCheckpoint()
    val n = emb.count()
    val trainTarget = math.max(512, 32 * nCells)
    val sample = emb.filter(
      col("vec_id") % SimilarityOps.sampleModulus(n, trainTarget) === 0)
      .localCheckpoint()
    val nSample = sample.count()

    var lastIter = System.nanoTime()
    val (sAssigned, tTrain) = timed {
      val a = SimilarityOps.trainIvf(sample, "vec_id", "embedding", nCells,
        iters = 2, onIteration = (i, re) => {
          re.count()
          val now = System.nanoTime()
          println(s"""{"probe":"build_split_iter","iter":$i,""" +
            s""""sec":${r3((now - lastIter) / 1e9)}}""")
          lastIter = now
        })
        .select(col("id"), col("assigned_cell").as("cell")).localCheckpoint()
      a.count(); a
    }
    val (cents, tCents) = timed {
      val c = SimilarityOps.centroids(
        sample.select(col("vec_id").as("id"), col("embedding").as("v"))
          .join(sAssigned, "id"), "cell", "v").localCheckpoint()
      c.count(); c
    }
    val (assigned, tAssign) = timed {
      val a = SimilarityOps.ivfAssign(emb, "vec_id", "embedding", cents)
        .select(col("id").as("neighbor_id"),
          col("assigned_cell").as("cell")).localCheckpoint()
      a.count(); a
    }
    val (codebook, tPqTrain) = timed {
      val cb = SimilarityOps.trainPq(sample, "vec_id", "embedding",
        dim, m, ksub, iters = 2).localCheckpoint()
      cb.count(); cb
    }
    val (codes, tEncode) = timed {
      val cd = SimilarityOps.pqEncode(emb, "vec_id", "embedding", dim, m, codebook)
        .select(col("id").as("neighbor_id"), col("codes")).localCheckpoint()
      cd.count(); cd
    }
    val (_, tJoins) = timed {
      codes.join(assigned, "neighbor_id")
        .join(emb.select(col("vec_id").as("neighbor_id")), "neighbor_id")
        .localCheckpoint().count()
    }
    println(s"""{"probe":"build_split","dir":"$dir","n":$n,"cells":$nCells,""" +
      s""""sample":$nSample,"coarse_train_sec":${r3(tTrain)},""" +
      s""""cents_sec":${r3(tCents)},"assign_sec":${r3(tAssign)},""" +
      s""""pq_train_sec":${r3(tPqTrain)},"encode_sec":${r3(tEncode)},""" +
      s""""joins_sec":${r3(tJoins)}}""")
    spark.stop()
  }
}
