package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `pqEncode` moved from the relational argmin (posexplode →
  * broadcast codebook join → n·m·ksub rows → min(struct) + collect
  * aggregates — measured as the whole index-build wall at the decade
  * tiers) to the map-only native `graftx.PqEncodeCodes`. Every PQ
  * consumer's oracle hash rides on the codes being IDENTICAL, so this
  * spec re-builds the OLD formulation inline and pins row-for-row
  * equality on fixtures exercising the edge semantics: a SPARSE
  * codebook (per-sub cell counts differ, non-contiguous cell ids),
  * duplicated centroids (exact d2 ties → lowest cell id), zero
  * vectors, a null vector ELEMENT (all-null d2 in one subspace →
  * lowest cell, the min(struct) resolution), and the real sf0.001
  * table under a trained codebook. The two deliberate deviations are
  * asserted directly: a NULL vector now yields null codes (the old
  * join emitted plausible lowest-cell codes), and an empty codebook
  * still yields zero usable rows.
  */
class PqEncodeParitySpec extends graft.SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val dsub = dim / m

  /** the pre-r13 formulation, verbatim. */
  private def oldEncode(vectors: DataFrame, idCol: String, vecCol: String,
                        codebook: DataFrame): DataFrame = {
    def dotD(a: Column, b: Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val vd = transform(col(vecCol), x => x.cast("double"))
    val subs = vectors.select(col(idCol).as("id"),
        posexplode(array((0 until m).map(s => slice(vd, s * dsub + 1, dsub)): _*)))
      .select(col("id"), col("pos").as("sub"), col("col").as("sv"))
    val dotSC = (0 until dsub).map(j =>
      element_at(col("sv"), j + 1) * element_at(col("centroid"), j + 1))
      .reduce(_ + _)
    subs.join(broadcast(codebook.withColumn("cnn",
        dotD(col("centroid"), col("centroid")))), "sub")
      .withColumn("d2", col("cnn") - lit(2.0) * dotSC)
      .groupBy("id", "sub")
      .agg(min(struct(col("d2"), col("cell"))).as("mc"))
      .select(col("id"), col("sub"), col("mc.cell").as("cell"))
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("sub"), col("cell")))).as("sc"))
      .select(col("id"),
        transform(col("sc"), x => x.getField("cell")).as("codes"))
  }

  private def rows(df: DataFrame): Seq[(Long, Seq[Int])] =
    df.select(col("id").cast("long"), col("codes"))
      .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq

  test("native encode == relational encode on the edge fixture") {
    val rng = new scala.util.Random(13)
    def vec(): Array[Float] = Array.fill(dim)(rng.nextGaussian().toFloat)
    val plain = (0L until 40L).map(i => (i, vec()))
    val fixture = (plain :+ (40L, Array.fill(dim)(0.0f))).toDF("vid", "v")
      // one null ELEMENT at position 5 → subspace 1's d2 is null for
      // every candidate → min(struct) resolves to its lowest cell id
      .union(spark.range(41, 42).select(col("id").as("vid"),
        expr(s"transform(sequence(0, ${dim - 1}), i -> " +
          "IF(i = 5, cast(null as float), cast(i as float)))").as("v")))
    // sparse, non-contiguous cells; sub 2 has a DUPLICATED centroid
    // (cells 4 and 9) so every vector ties there and must take cell 4
    val cb = Seq(
      (0, 0, Array.fill(dsub)(rng.nextGaussian())),
      (0, 1, Array.fill(dsub)(rng.nextGaussian())),
      (0, 7, Array.fill(dsub)(rng.nextGaussian())),
      (1, 2, Array.fill(dsub)(rng.nextGaussian())),
      (1, 3, Array.fill(dsub)(rng.nextGaussian()))) ++ {
      val dup = Array.fill(dsub)(rng.nextGaussian())
      Seq((2, 4, dup), (2, 9, dup.clone()),
        (3, 0, Array.fill(dsub)(rng.nextGaussian())),
        (3, 1, Array.fill(dsub)(rng.nextGaussian())),
        (3, 2, Array.fill(dsub)(rng.nextGaussian())))
    }
    val codebook = cb.toDF("sub", "cell", "centroid")
    val neu = rows(SimilarityOps.pqEncode(fixture, "vid", "v", dim, m, codebook))
    val old = rows(oldEncode(fixture, "vid", "v", codebook))
    assert(neu == old)
    assert(neu.forall(_._2(2) == 4), "duplicate-centroid tie must take cell 4")
    assert(neu.find(_._1 == 41L).exists(_._2(1) == 2),
      "null element → subspace 1 resolves to its lowest cell id")
  }

  test("parity on the real embeddings table under a trained codebook") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("v"))
    val codebook = SimilarityOps.trainPq(emb, "vid", "v", 64, 16, 32, iters = 2)
      .localCheckpoint()
    val dsub64 = 64 / 16
    def old64(vectors: DataFrame): DataFrame = {
      def dotD(a: Column, b: Column) =
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      val vd = transform(col("v"), x => x.cast("double"))
      val subs = vectors.select(col("vid").as("id"),
          posexplode(array((0 until 16).map(s =>
            slice(vd, s * dsub64 + 1, dsub64)): _*)))
        .select(col("id"), col("pos").as("sub"), col("col").as("sv"))
      val dotSC = (0 until dsub64).map(j =>
        element_at(col("sv"), j + 1) * element_at(col("centroid"), j + 1))
        .reduce(_ + _)
      subs.join(broadcast(codebook.withColumn("cnn",
          dotD(col("centroid"), col("centroid")))), "sub")
        .withColumn("d2", col("cnn") - lit(2.0) * dotSC)
        .groupBy("id", "sub")
        .agg(min(struct(col("d2"), col("cell"))).as("mc"))
        .select(col("id"), col("sub"), col("mc.cell").as("cell"))
        .groupBy("id")
        .agg(array_sort(collect_list(struct(col("sub"), col("cell")))).as("sc"))
        .select(col("id"),
          transform(col("sc"), x => x.getField("cell")).as("codes"))
    }
    assert(rows(SimilarityOps.pqEncode(emb, "vid", "v", 64, 16, codebook)) ==
      rows(old64(emb)))
  }

  test("deviations are loud or null, never plausible codes") {
    val codebook = (0 until m).flatMap(s => (0 until 2).map(c =>
      (s, c, Array.fill(dsub)(0.5)))).toDF("sub", "cell", "centroid")
    // null VECTOR → null codes (old emitted lowest-cell codes)
    val nullVec = spark.sql(
      "SELECT 0L AS vid, cast(null as array<float>) AS v")
    val out = SimilarityOps.pqEncode(nullVec, "vid", "v", dim, m, codebook)
      .collect()
    assert(out.length == 1 && out(0).isNullAt(1))
    // empty codebook → zero rows, the old inner join's shape
    val some = Seq((1L, Array.fill(dim)(0.1f))).toDF("vid", "v")
    val empty = codebook.filter(lit(false))
    assert(SimilarityOps.pqEncode(some, "vid", "v", dim, m, empty).isEmpty)
    // a subspace missing from the codebook throws (the old join
    // silently dropped the position, shifting later codes left)
    val sparse = codebook.filter(col("sub") =!= 2)
    val err = intercept[Exception] {
      SimilarityOps.pqEncode(some, "vid", "v", dim, m, sparse).collect()
    }
    assert(err.getMessage != null)
  }
}
