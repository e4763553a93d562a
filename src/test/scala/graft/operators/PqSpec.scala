package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization: codebook training, encoding, ADC search.
  *
  * The exactness case separates the ARITHMETIC from the training: a
  * hand-built codebook whose centroids are exactly the corpus's
  * subvector patterns makes PQ reconstruction lossless, so the ADC
  * dot must equal the exact dot bit-for-bit and the PQ top-k must
  * equal brute force — any drift is a bug in encode/lookup, not an
  * approximation artifact. Training quality is pinned separately
  * (Lloyd rounds must not increase quantization error; recall on the
  * real table must clear the query row's threshold with margin).
  */
class PqSpec extends graft.SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("hand-built lossless codebook: encoding is exact (codes == id bits)") {
    // dim 8, m 4, dsub 2: per subspace two patterns, (sub, sub) and
    // (-sub, sub+1); every vector concatenates one pattern per
    // subspace, chosen by bit s of its id
    val dim = 8; val m = 4
    def pattern(s: Int, which: Int): Seq[Double] =
      if (which == 0) Seq(s.toDouble, s.toDouble) else Seq(-s.toDouble, s + 1.0)
    val vecs = (0L until 16L).map { id =>
      val v = (0 until m).flatMap(s => pattern(s, ((id >> s) & 1L).toInt))
      (id, v.map(_.toFloat).toArray)
    }.toDF("vec_id", "embedding")
    val cbRows = (0 until m).flatMap(s => Seq(
      Row(s, 0, pattern(s, 0)), Row(s, 1, pattern(s, 1))))
    val codebook = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(cbRows).asJava),
      StructType(Seq(StructField("sub", IntegerType),
        StructField("cell", IntegerType),
        StructField("centroid", ArrayType(DoubleType)))))

    // codes reproduce the id bits exactly (cell s == bit s of id)
    val codes = SimilarityOps.pqEncode(vecs, "vec_id", "embedding", dim, m, codebook)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size == 16)
    for ((id, cs) <- codes; s <- 0 until m)
      assert(cs(s) == ((id >> s) & 1L).toInt,
        s"id=$id sub=$s expected bit ${(id >> s) & 1L}, got ${cs(s)}")
  }

  test("trainPq: codebook shape; Lloyd rounds do not increase quantization error") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    def cb(iters: Int) =
      SimilarityOps.trainPq(emb, "vec_id", "embedding", dim = 64, m = 8,
        ksub = 16, iters = iters)
    val cb3 = cb(3)
    val rows = cb3.collect()
    assert(rows.forall(_.getSeq[Double](2).length == 8), "dsub must be dim/m")
    val bySub = rows.groupBy(_.getInt(0))
    assert(bySub.keySet == (0 until 8).toSet)
    assert(bySub.values.forall(g => g.length <= 16 && g.length > 1))

    // mean squared quantization error must be no worse after 3 rounds
    // than after 1 (Lloyd is monotone non-increasing per full round)
    def mse(codebook: org.apache.spark.sql.DataFrame): Double = {
      val subs = emb.select(col("vec_id").as("id"),
          posexplode(array((0 until 8).map(s =>
            slice(transform(col("embedding"), x => x.cast("double")),
              s * 8 + 1, 8)): _*)))
        .select(col("id"), col("pos").as("sub"), col("col").as("sv"))
      subs.join(broadcast(codebook), "sub")
        .withColumn("d2", aggregate(
          zip_with(col("sv"), col("centroid"),
            (x, y) => (x - y) * (x - y)), lit(0.0), (a, v) => a + v))
        .groupBy("id", "sub").agg(min("d2").as("d2"))
        .agg(avg("d2")).collect()(0).getDouble(0)
    }
    val e1 = mse(cb(1)); val e3 = mse(cb3)
    assert(e3 <= e1 + 1e-12, s"quantization error rose across rounds: $e1 -> $e3")
  }

  test("pqTopK: recall >= 0.9 vs brute force with the query row's config, and deterministic") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val mod = SimilarityOps.sampleModulus(n, 64)
    val sample = emb.filter(col("vec_id") % mod === 0)
    val exact = SimilarityOps.bruteForceTopK(sample, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
    def run() = SimilarityOps.pqTopK(sample, emb, "vec_id", "embedding",
      dim = 64, m = 16, ksub = 32, iters = 3,
      candK = math.max(100, (n / 10).toInt), k = 5)
    val pq = run()
    val hits = exact.join(
        pq.select(col("query_id"), col("neighbor_id"), lit(1).as("hit")),
        Seq("query_id", "neighbor_id"), "left")
      .agg(sum(coalesce(col("hit"), lit(0))), count(lit(1))).collect()(0)
    val recall = hits.getLong(0).toDouble / hits.getLong(1)
    assert(recall >= 0.9, s"PQ recall $recall below the pinned 0.9")
    // replay-deterministic: hash init + argmin tie-breaks are total
    val a = run().collect().map(_.toString).sorted.toSeq
    val b = run().collect().map(_.toString).sorted.toSeq
    assert(a == b, "pqTopK is not replay-deterministic")
  }

  test("candK >= n makes pqTopK identical to brute force (rescore covers everything)") {
    // the approximation lives ONLY in candidate selection: once every
    // corpus vector is a candidate, the exact-rescore stage must
    // reproduce brute force bit-for-bit (ranks, tie-breaks, rounding)
    // no matter how bad the trained codebook is — this pins the whole
    // search pipeline's arithmetic independently of training quality
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val sample = emb.filter(col("vec_id") % SimilarityOps.sampleModulus(n, 16) === 0)
    val pq = SimilarityOps.pqTopK(sample, emb, "vec_id", "embedding",
        dim = 64, m = 4, ksub = 4, iters = 1, candK = n.toInt, k = 5)
      .collect().map(_.toString).sorted.toSeq
    val bf = SimilarityOps.bruteForceTopK(sample, emb, "vec_id", "embedding", 5)
      .collect().map(_.toString).sorted.toSeq
    assert(pq == bf, "full-candidate PQ diverged from brute force")
  }
}
