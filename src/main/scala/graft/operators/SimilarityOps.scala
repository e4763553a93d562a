package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.GraftFunctions.{vecDot, vecNorm}
import graft.functions.DetRound.r4

/** Vector-similarity operators over an `array<float>` embedding column.
  *
  * Dot products run through the native codegen'd
  * [[org.apache.spark.sql.graftx.FloatVecDot]] expression — a
  * sequential double-precision fold in index order, bit-identical to
  * DuckDB's `list_reduce` fold, so brute-force cosine stays
  * oracle-checkable while the pair-join hot path stays inside
  * whole-stage codegen. Norms are computed ONCE per vector before any
  * pair join (never per pair).
  *
  * Scale design: brute-force is the correctness baseline (O(n·q));
  * the production path pre-partitions by a coarse quantizer — either
  * random-hyperplane LSH buckets (`rhpSignature`) or IVF centroids
  * (`ivfAssign`) — so each query probes a small fraction of vectors.
  */
object SimilarityOps {

  def dot(a: Column, b: Column): Column = vecDot(a, b)

  def l2Norm(a: Column): Column = vecNorm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** id + vector + precomputed norm — the shape every pair op joins on. */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
                       id: String, vec: String, nrm: String): DataFrame =
    df.select(col(idCol).as(id), col(vecCol).as(vec),
      vecNorm(col(vecCol)).as(nrm))

  /** Brute-force top-k cosine neighbors for each query vector: small
    * query side broadcast, norms precomputed per side, per-query
    * TakeOrdered via window row_number.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, idCol, vecCol, "query_id", "qv", "qn")
    val c = withNorm(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), r4(col("cos")).as("cos"))
  }

  /** All pairs with cosine ≥ minSim (embedding near-dup detection),
    * exact O(n²/2) — the correctness baseline the LSH path is judged
    * against.
    */
  def cosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
                  minSim: Double): DataFrame = {
    val a = withNorm(vectors, idCol, vecCol, "id_a", "va", "na")
    val b = withNorm(vectors, idCol, vecCol, "id_b", "vb", "nb")
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", vecDot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= minSim)
      .select(col("id_a"), col("id_b"), r4(col("cos")).as("cos"))
  }

  /** Random-hyperplane LSH signature: sign bits of `nBits` fixed
    * pseudo-random hyperplanes. Hyperplane components are deterministic
    * hash-derived values in [-1,1] — reproducible across runs/engines
    * with the same construction.
    */
  def rhpSignature(vec: Column, dim: Int, nBits: Int): Column =
    org.apache.spark.sql.graftx.GraftFunctions.rhpSignature(vec, dim, nBits)

  /** ANN via LSH buckets: candidates share the exact signature bucket;
    * cosine computed only within buckets. Recall is tunable with
    * nBits/multi-probe; this is the 100TB path (bucket = shuffle key).
    */
  def lshTopK(vectors: DataFrame, idCol: String, vecCol: String,
              dim: Int, nBits: Int, k: Int): DataFrame = {
    val sig = vectors.select(col(idCol).as("id"), col(vecCol).as("v"),
      vecNorm(col(vecCol)).as("n"),
      rhpSignature(col(vecCol), dim, nBits).as("bucket"))
    val pairs = sig.as("a").join(sig.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"),
        (vecDot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n"))).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), r4(col("cos")).as("cos"))
  }

  /** IVF build step: per-partition centroids as elementwise means —
    * posexplode → groupBy(cell, dim) avg → re-assemble. Relational and
    * oracle-checkable; at scale this is one shuffle of n·dim scalars.
    */
  def centroids(vectors: DataFrame, cellCol: String, vecCol: String): DataFrame =
    vectors.select(col(cellCol).as("cell"), posexplode(col(vecCol)))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("col").cast("double")).as("mean"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("mean")))).as("pm"))
      .select(col("cell"), transform(col("pm"), x => x.getField("mean")).as("centroid"))

  /** IVF assign step: nearest centroid by cosine for each vector
    * (centroids are double arrays → cast vectors up, fold via HOF here
    * since centroids are few).
    */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
                cents: DataFrame): DataFrame = {
    val dotD = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val vecD = transform(col("v"), x => x.cast("double"))
    val scored = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(broadcast(cents))
      .withColumn("cos", dotD(vecD, col("centroid")) /
        (sqrt(dotD(vecD, vecD)) * sqrt(dotD(col("centroid"), col("centroid")))))
    val w = Window.partitionBy("id").orderBy(col("cos").desc, col("cell").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("cell").as("assigned_cell"), r4(col("cos")).as("cos"))
  }
}
