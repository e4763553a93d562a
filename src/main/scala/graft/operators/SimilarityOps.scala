package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DetRound.r4

/** Vector-similarity operators over an `array<float>` embedding column.
  *
  * All dot products are sequential left-folds in DOUBLE precision over
  * the array order (`aggregate` with a 0.0 seed) — bit-identical to any
  * engine that folds the same way, which makes brute-force cosine
  * oracle-checkable. No UDFs.
  *
  * Scale design: brute-force is the correctness baseline (O(n·q));
  * the production path pre-partitions by a coarse quantizer — either
  * random-hyperplane LSH buckets (`rhpSignature`) or IVF centroids
  * (`ivfAssign`) — so each query probes a small fraction of vectors.
  */
object SimilarityOps {

  /** Elementwise float→double cast. */
  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two equal-length arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force top-k cosine neighbors for each query vector.
    * One shuffle (the theta join is a broadcast of the small query
    * side), then a per-query TakeOrdered via window row_number.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), r4(col("cos")).as("cos"))
  }

  /** Random-hyperplane LSH signature: sign bits of `nBits` fixed
    * pseudo-random hyperplanes. Hyperplane components are deterministic
    * hash-derived values in [-1,1] — reproducible across runs/engines
    * with the same construction.
    */
  def rhpSignature(vec: Column, dim: Int, nBits: Int): Column = {
    val sig = (0 until nBits).map { b =>
      // pseudo-random plane component for (bit, dimension): a fixed
      // LCG stream; folded dot product against the vector
      val comps = (0 until dim).map { d =>
        val x = (1103515245L * (b * dim + d + 12345L) + 12345L) % 2147483647L
        lit((x.toDouble / 2147483647.0) * 2 - 1)
      }
      val proj = (0 until dim).map(d => element_at(vec, d + 1).cast("double") * comps(d))
        .reduce(_ + _)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    sig.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via LSH buckets: candidates share the exact signature bucket;
    * cosine computed only within buckets. Recall is tunable with
    * nBits/multi-probe; this is the 100TB path (bucket = shuffle key).
    */
  def lshTopK(vectors: DataFrame, idCol: String, vecCol: String,
              dim: Int, nBits: Int, k: Int): DataFrame = {
    val sig = vectors.select(col(idCol).as("id"), col(vecCol).as("v"),
      rhpSignature(col(vecCol), dim, nBits).as("bucket"))
    val pairs = sig.as("a").join(sig.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"),
        cosine(col("a.v"), col("b.v")).as("cos"))
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

  /** IVF assign step: nearest centroid by cosine for each vector. */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
                cents: DataFrame): DataFrame = {
    val scored = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(broadcast(cents))
      .withColumn("cos", cosine(col("v"), col("centroid")))
    val w = Window.partitionBy("id").orderBy(col("cos").desc, col("cell").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("cell").as("assigned_cell"), r4(col("cos")).as("cos"))
  }
}
