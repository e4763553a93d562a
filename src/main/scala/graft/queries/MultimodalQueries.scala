package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing exercised relationally: binary payload attach →
  * per-partition stub decode → typed metadata → aggregation. The stub
  * decode is arithmetic on byte length, so the whole chain has an
  * exact SQL oracle.
  */
object MultimodalQueries extends QueryPack {

  q("mm_decode_meta",
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents)
      |SELECT doc_id, n_bytes,
      |  CAST(n_bytes % 640 AS INTEGER) AS width,
      |  CAST((n_bytes * 7) % 480 AS INTEGER) AS height,
      |  CAST(n_bytes % 24 + 1 AS INTEGER) AS n_frames
      |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    Multimodal.decodeMeta(s, Multimodal.withPayload(docs))
      .toDF()
      .select("doc_id", "n_bytes", "width", "height", "n_frames")
      .orderBy("doc_id")
  }

  // MIME sniffing — magic-byte triage over opaque binary payloads
  // (the first media-lake step: route by container format WITHOUT
  // decoding). Payloads carry real signature bytes (PNG/JPEG/GIF/PDF/
  // RIFF prepended per doc_id), the sniff reads a 4-byte hex prefix
  // through a CASE ladder, all codegen'd. The oracle derives the
  // expected routing from the deterministic construction.
  q("mm_mime_sniff",
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 5 AS INTEGER)
      |      WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
      |      WHEN 2 THEN 'image/gif' WHEN 3 THEN 'application/pdf'
      |      ELSE 'audio/wav' END AS mime,
      |    CAST(octet_length(encode(text)) +
      |      CASE WHEN doc_id % 5 = 1 THEN 3 ELSE 4 END AS BIGINT) AS n_bytes
      |  FROM documents)
      |SELECT mime, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes
      |FROM m GROUP BY mime ORDER BY mime""".stripMargin) { (s, dir) =>
    Multimodal.withMagicPayload(Tables.load(s, dir, "documents"))
      .select(Multimodal.sniffMime(col("payload")).as("mime"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy("mime")
      .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"))
      .orderBy("mime")
  }

  // Media near-dup end-to-end: payload → per-partition stub embedding
  // (byte-8-gram feature hashing — locality-sensitive like a real
  // encoder, so near-identical payloads land at cosine ≈1 while
  // unrelated ones sit ≤0.62 on this corpus) → banded RHP LSH
  // near-dup pairs at τ=0.9 — the media twin of dd_simhash. The
  // byte-gram embedding is not SQL-expressible, so the hashed row
  // pins measured recall vs the brute-force cosine twin over the SAME
  // stub embeddings at ≥ 0.9 (measured 1.0 at every sf). Oracle: doc
  // count + literal true.
  q("mm_embed_neardup",
    """SELECT CAST(count(*) AS BIGINT) AS n_docs, true AS recall_ok
      |FROM documents""".stripMargin) { (s, dir) =>
    import graft.operators.SimilarityOps
    // materialize the encoder output once (the in-job stand-in for the
    // persisted embeddings table a real pipeline writes) — the LSH pair
    // op references its input 4× and the exact twin twice more; an
    // unmaterialized plan would re-run extraction each time
    val docs = Tables.load(s, dir, "documents")
    val emb = Multimodal.stubEmbedding(
      Multimodal.withPayload(docs), dim = 64)
      .localCheckpoint()
    // DENSE-corpus geometry: stub embeddings of same-vocabulary docs
    // put unrelated pairs at cosine ≈ 0.6 (not ≈ 0), so bits/band must
    // grow as log(n/32)/log(1/p(0.62)) — sizing against the noise
    // FLOOR, not random collisions — or noise-pair candidates grow
    // ∝ n² (measured 15.7× runtime at 10× docs under the old fixed
    // 24×12). Bands then come from the s-curve at the τ=0.9 verify
    // threshold (true pairs sit ≥0.944 — recalled strictly higher).
    val nDocs = docs.count()
    val bits = SimilarityOps.autoBitsForNoise(nDocs, noiseSim = 0.62)
    val nBands = SimilarityOps.autoBandsForBits(bits, minSim = 0.9)
    val lsh = SimilarityOps.embeddingLshPairs(emb, "doc_id", "embedding",
        dim = 64, bands = nBands, bitsPerBand = bits, minSim = 0.9)
      .select(col("id_a"), col("id_b"), lit(1).as("__hit"))
    // exact twin sampled to a fixed ~512-doc modulus slice: recall is
    // pinned on pairs incident to the sample (O(n·s), not O(n²) — the
    // LSH path itself answers the full corpus)
    val k = SimilarityOps.sampleModulus(nDocs, 512)
    val exact = SimilarityOps.cosinePairsFor(
        emb.filter(col("doc_id") % k === 0), emb,
        "doc_id", "embedding", minSim = 0.9)
      .select(col("id_a"), col("id_b"))
    val stats = exact.join(lsh, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("__n_exact"),
        sum(coalesce(col("__hit"), lit(0))).as("__hits"))
    docs.agg(count(lit(1)).as("n_docs")).crossJoin(stats)
      .select(col("n_docs"),
        (coalesce(col("__hits"), lit(0)) >= col("__n_exact") * lit(0.9)).as("recall_ok"))
  }

  // Segment-hash media near-dup: docs sharing ≥1 identical full
  // 64-byte chunk — the per-segment-hash technique video/audio dedup
  // uses. `shared` counts DISTINCT fingerprints in both docs (raw
  // occurrence rows would square within-doc repeats of filler chunks
  // into false-positive pairs). Fully SQL-expressible on the stub
  // payload, so hash-oracled.
  q("mm_segment_neardup",
    """WITH chunks AS (
      |  SELECT doc_id, unnest(generate_series(0,
      |    CAST(floor(length(text) / 64) AS INTEGER))) AS ck
      |  FROM documents),
      |fp AS (
      |  SELECT DISTINCT c.doc_id, md5(substring(d.text, c.ck * 64 + 1, 64)) AS fp
      |  FROM chunks c JOIN documents d USING (doc_id)
      |  WHERE length(substring(d.text, c.ck * 64 + 1, 64)) = 64)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(count(*) AS BIGINT) AS shared
      |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    Multimodal.segmentNearDupPairs(Tables.load(s, dir, "documents"),
        "doc_id", "text", chunkLen = 64, minShared = 1L)
      .orderBy("id_a", "id_b")
  }

  q("mm_frame_sample",
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(octet_length(encode(text)) AS BIGINT) % 24 + 1 AS n_frames
      |  FROM documents)
      |SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, 4)) AS BIGINT) AS frame_idx
      |FROM m ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val meta = Multimodal.decodeMeta(s, Multimodal.withPayload(docs))
    Multimodal.sampleFrames(meta, everyK = 4)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))
      .orderBy("doc_id", "frame_idx")
  }
}
