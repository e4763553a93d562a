package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The stored-index contract, proven through DISK: [[SimilarityOps
  * .buildIvfPq]]'s scaladoc promises the three index frames are
  * "plain frames a caller can persist as tables and reload across
  * query batches" — this spec actually writes them to parquet,
  * reloads them into fresh frames (new lineage, schema as parquet
  * round-trips it), and pins that search and append over the
  * RELOADED index are bit-identical to the in-memory ones. Guards
  * the round-trip hazards a lineage-only test never sees: array
  * element types (codes are Array[Int], centroids Array[Double],
  * the vec norms Double), nullability widening on read, and any
  * accidental dependence on the build's physical partitioning.
  */
class IvfPqPersistSpec extends graft.SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val (dim, m, ksub) = (64, 4, 4)

  private def roundTrip(df: DataFrame, dir: String): DataFrame = {
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("search over a parquet-reloaded index == search over the built index") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") % 37 === 0)
    val (cents, codebook, codes) = SimilarityOps.buildIvfPq(
      emb, "vec_id", "embedding", dim, m, ksub, nCells = 8,
      trainSample = Some(emb.filter(col("vec_id") % 3 === 0)),
      metaCols = Seq("label"))
    val base = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    val (centsR, codebookR, codesR) = (
      roundTrip(cents, s"$base/cents"),
      roundTrip(codebook, s"$base/codebook"),
      roundTrip(codes, s"$base/codes"))

    def search(c: DataFrame, cb: DataFrame, cd: DataFrame,
               filter: Option[org.apache.spark.sql.Column]) =
      SimilarityOps.ivfPqSearch(queries, emb, "vec_id", "embedding",
          dim, m, ksub, c, cb, cd, nprobe = 4, candK = 50, k = 5,
          preFilter = filter)
        .collect().map(_.toString).sorted.toSeq

    val mem = search(cents, codebook, codes, None)
    val disk = search(centsR, codebookR, codesR, None)
    assert(mem.nonEmpty && mem == disk,
      "reloaded-index search diverged from the built index")

    // the metadata column survives the round-trip and still filters
    val pred = col("label") < 3
    val memF = search(cents, codebook, codes, Some(pred))
    val diskF = search(centsR, codebookR, codesR, Some(pred))
    assert(memF.nonEmpty && memF == diskF,
      "reloaded-index FILTERED search diverged")
  }

  test("append over parquet-reloaded structures == append over the built ones") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    val (cents, codebook, codes) = SimilarityOps.buildIvfPq(
      base, "vec_id", "embedding", dim, m, ksub, nCells = 8,
      trainSample = Some(base.filter(col("vec_id") % 3 === 0)))
    val dirBase = java.nio.file.Files.createTempDirectory("ivfpq_app").toString
    val (centsR, codebookR, codesR) = (
      roundTrip(cents, s"$dirBase/cents"),
      roundTrip(codebook, s"$dirBase/codebook"),
      roundTrip(codes, s"$dirBase/codes"))

    def appended(c: DataFrame, cb: DataFrame, cd: DataFrame) =
      SimilarityOps.ivfPqAppend(delta, "vec_id", "embedding", dim, m, c, cb, cd)
        .select(col("neighbor_id"), col("cell").cast("long"), col("codes"), col("cn"))
        .collect().map(_.toString).sorted.toSeq

    val mem = appended(cents, codebook, codes)
    val disk = appended(centsR, codebookR, codesR)
    assert(mem.nonEmpty && mem == disk,
      "append over reloaded structures diverged from the in-memory append")
  }
}
