package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DetRound.r4

/** `ivfAssign` moved from join-then-`min(struct)` (which planned
  * SortAggregate — struct buffers are not hash-aggregable — and sorted
  * the n·k scored stream, measured spilling ~300 GB at the 2M ×
  * 5660-cell production geometry) to the map-only native
  * `graftx.IvfArgMin`. Every IVF consumer's oracle hash rides on the
  * assignment being IDENTICAL, so this spec re-builds the OLD
  * formulation inline and pins row-for-row equality on a fixture that
  * exercises the edge semantics: zero-norm vectors (score −1.0,
  * lowest cell), duplicated centroids (exact ties → lowest cell id),
  * and the real sf0.001 table.
  */
class IvfAssignParitySpec extends graft.SparkSpec {
  import spark.implicits._

  /** the pre-r13 formulation, verbatim. */
  private def oldAssign(vectors: DataFrame, idCol: String, vecCol: String,
                        cents: DataFrame): DataFrame = {
    def dotD(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val vd = transform(col(vecCol), x => x.cast("double"))
    val v = vectors.select(col(idCol).as("id"), vd.as("vd"),
      sqrt(dotD(vd, vd)).as("vn"))
    val cts = cents.select(col("cell"), col("centroid"),
      sqrt(dotD(col("centroid"), col("centroid"))).as("cn"))
    v.join(broadcast(cts))
      .withColumn("cos", when(col("vn") * col("cn") > 0,
        dotD(col("vd"), col("centroid")) / (col("vn") * col("cn")))
        .otherwise(lit(-1.0)))
      .groupBy("id")
      .agg(min(struct((-col("cos")).as("nc"), col("cell"))).as("m"))
      .select(col("id"), col("m.cell").as("assigned_cell"),
        r4(-col("m.nc")).as("cos"))
  }

  private def rows(df: DataFrame): Seq[(Long, Int, Double)] =
    df.select(col("id").cast("long"), col("assigned_cell"), col("cos"))
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq

  test("map-only assign == join+min(struct) assign, edges included") {
    val rng = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(16)(rng.nextGaussian().toFloat)
    val vectors = ((0L until 60L).map(i => (i, vec())) :+
      (60L, Array.fill(16)(0.0f)) // zero norm → cos −1.0, lowest cell
      ).toDF("vid", "v")
    val base = (0 until 6).map(c => (c, Array.fill(16)(rng.nextGaussian())))
    // cell 6 duplicates cell 3's centroid exactly: every vector ties on
    // cos between them and must resolve to cell 3 (lowest id)
    val cents = (base :+ (6, base(3)._2)).toDF("cell", "centroid")
    val neu = rows(SimilarityOps.ivfAssign(vectors, "vid", "v", cents))
    val old = rows(oldAssign(vectors, "vid", "v", cents))
    assert(neu == old)
    assert(!neu.exists(_._2 == 6), "tie must resolve to the lowest cell id")
    assert(neu.find(_._1 == 60L).exists(r => r._2 == 0 && r._3 == -1.0))
  }

  test("parity on the real embeddings table") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("v"))
    val seed = emb.withColumn("cell",
      pmod(xxhash64(col("vid")), lit(8L)).cast("int"))
    val cents = SimilarityOps.centroids(seed, "cell", "v").localCheckpoint()
    assert(rows(SimilarityOps.ivfAssign(emb, "vid", "v", cents)) ==
      rows(oldAssign(emb, "vid", "v", cents)))
  }
}
