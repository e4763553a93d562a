package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, SimilarityOps}

/** One-off measurement harness for the r7 recall-pin conversions:
  * prints the measured recall / agreement / separation of every
  * approximate operator against its exact twin per sf directory, so
  * the hashed-row thresholds are set from data, not hope.
  * (Throwaway diagnostic — not part of the query surface.)
  */
object DebugRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .as[(Long, Long)].collect().toSet
    def topkSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .as[(Long, Long)].collect().toSet

    for (sf <- args.toSeq match { case Nil => Seq("0.001", "0.01", "0.1"); case a => a }) {
      val dir = s"/root/testdata/sf$sf"
      val t0 = System.nanoTime()
      val emb = Tables.load(spark, dir, "embeddings")
      val docs = Tables.load(spark, dir, "documents")

      // 1. ann_lsh_topk: all-query LSH top-5 vs brute top-5
      val exactK = topkSet(SimilarityOps.bruteForceTopK(emb, emb, "vec_id", "embedding", 5))
      val lshK = topkSet(SimilarityOps.lshTopKAuto(emb, "vec_id", "embedding", 64, 8, 5))
      println(s"sf$sf ann_lsh_topk recall=${(lshK & exactK).size.toDouble / exactK.size} n_exact=${exactK.size}")

      // 1b. ann_pca_topk: 1-in-4 sample, 16-dim stage 1, top-50 candidates
      val sample = emb.filter(col("vec_id") % 4 === 0)
      val (basis, _) = SimilarityOps.pcaBasis(emb, "embedding", 16)
      val exactS = topkSet(SimilarityOps.bruteForceTopK(sample, emb, "vec_id", "embedding", 5))
      val pcaK = topkSet(SimilarityOps.pcaTopK(sample, emb, "vec_id", "embedding", basis, math.max(50, (emb.count() / 20).toInt), 5))
      println(s"sf$sf ann_pca_topk recall=${(pcaK & exactS).size.toDouble / exactS.size} n_exact=${exactS.size}")

      // 2. ann_ivf_search (queries vec_id<10)
      val q10 = emb.filter(col("vec_id") < 10)
      val exact10 = topkSet(SimilarityOps.bruteForceTopK(q10, emb, "vec_id", "embedding", 5))
      val ivf = topkSet(SimilarityOps.ivfSearch(q10, emb, "vec_id", "embedding", "label", 3, 5))
      println(s"sf$sf ann_ivf_search recall=${(ivf & exact10).size.toDouble / exact10.size}")

      // 3. ann_ivf_train: affinity after 1 vs 3 iters, assignment sanity
      val t1 = SimilarityOps.trainIvf(emb, "vec_id", "embedding", 8, 1)
        .agg(avg("cos")).head().getDouble(0)
      val a3 = SimilarityOps.trainIvf(emb, "vec_id", "embedding", 8, 3)
      val t3 = a3.agg(avg("cos")).head().getDouble(0)
      val nAssigned = a3.count(); val nVec = emb.count()
      println(s"sf$sf ann_ivf_train mean_cos_1=$t1 mean_cos_3=$t3 assigned=$nAssigned n=$nVec")

      // 4. dd_minhash_lsh vs uncapped exact jaccard
      val exactJ = pairSet(DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2, None))
      val mh = pairSet(DedupOps.minHashLshPairs(docs, "doc_id", "text", 3, 8, 4, 0.2))
      println(s"sf$sf dd_minhash_lsh recall=${if (exactJ.isEmpty) 1.0 else (mh & exactJ).size.toDouble / exactJ.size} n_exact=${exactJ.size} n_lsh=${mh.size}")

      // 5. dd_simhash exactness vs brute hamming
      val sigs = docs.select(col("doc_id"), DedupOps.simHash(col("text")).as("sim"))
      val brute = pairSet(sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
        .filter(bit_count(col("a.sim").bitwiseXOR(col("b.sim"))) <= 3)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")))
      val sh = pairSet(DedupOps.simHashPairs(docs, "doc_id", "text", 3))
      println(s"sf$sf dd_simhash exact=${sh == brute} n_brute=${brute.size} n_banded=${sh.size}")

      // 6. dd_embedding_lsh vs exact cosine pairs (0.45)
      val exactP = pairSet(SimilarityOps.cosinePairs(emb, "vec_id", "embedding", 0.45))
      val lshP = pairSet(SimilarityOps.embeddingLshPairsAuto(emb, "vec_id", "embedding", 64, 12, 0.45))
      println(s"sf$sf dd_embedding_lsh recall=${if (exactP.isEmpty) 1.0 else (lshP & exactP).size.toDouble / exactP.size} n_exact=${exactP.size}")

      // 7. dd_embedding_clusters_lsh agreement with exact clusters (0.4)
      def clusters(pairs: DataFrame): Map[Long, Long] =
        graft.operators.RelationalOps.connectedComponents(
            emb.select(col("vec_id")), "vec_id", pairs, "id_a", "id_b")
          .select(col("vec_id").cast("long"), col("cluster_id").cast("long"))
          .as[(Long, Long)].collect().toMap
      val ce = clusters(SimilarityOps.cosinePairs(emb, "vec_id", "embedding", 0.4))
      val cl = clusters(SimilarityOps.embeddingLshPairsAuto(emb, "vec_id", "embedding", 64, 12, 0.4))
      val agree = ce.count { case (id, c) => cl.get(id).contains(c) }
      println(s"sf$sf dd_embedding_clusters_lsh agreement=${agree.toDouble / ce.size} n_exact_clusters=${ce.values.toSet.size}")

      // 8. mm_embed_neardup vs exact cosine pairs on stub embedding (0.9)
      val memb = graft.multimodal.Multimodal.stubEmbedding(
        graft.multimodal.Multimodal.withPayload(docs), dim = 64).localCheckpoint()
      val mExact = pairSet(SimilarityOps.cosinePairs(memb, "doc_id", "embedding", 0.9))
      val mLsh = pairSet(SimilarityOps.embeddingLshPairs(memb, "doc_id", "embedding", 64, 24, 12, 0.9))
      println(s"sf$sf mm_embed_neardup recall=${if (mExact.isEmpty) 1.0 else (mLsh & mExact).size.toDouble / mExact.size} n_exact=${mExact.size}")

      // 9. tx_ml_gate: prediction vs weak heuristic label agreement on odd half
      val reference = docs.filter(col("doc_id") % 2 === 0)
      val incoming = docs.filter(col("doc_id") % 2 === 1)
      val model = graft.operators.MlGate.train(reference, "text", 0.1)
      val scored = graft.operators.MlGate.score(model, incoming, "text")
        .withColumn("weak",
          when(graft.functions.TextFunctions.qualityScore(col("text")) >= 0.1, 1.0).otherwise(0.0))
      val n = scored.count()
      val ag = scored.filter(col("prediction") === col("weak")).count()
      println(s"sf$sf tx_ml_gate agreement=${ag.toDouble / n} n=$n")
      println(f"sf$sf wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
