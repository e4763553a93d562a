package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dedupKeepFirst keeps exactly the row the tie-break orders first") {
    val df = Seq(("a", 2, "second"), ("a", 1, "first"), ("b", 5, "only"))
      .toDF("k", "seq", "tag")
    val out = RelationalOps.dedupKeepFirst(df, Seq("k"), Seq(col("seq")))
    assert(out.orderBy("k").select("tag").as[String].collect().toSeq ==
      Seq("first", "only"))
  }

  test("pivotAvg pins columns even for absent values") {
    val df = Seq((1, "x", 2.0), (1, "x", 4.0)).toDF("id", "p", "v")
    val out = RelationalOps.pivotAvg(df, Seq("id"), "p", Seq("x", "y"), "v")
    assert(out.columns.toSeq == Seq("id", "x", "y"))
    assert(out.head() == Row(1, 3.0, null))
  }

  test("enrich never fans out on duplicate dim rows") {
    val facts = Seq((1, "f1"), (2, "f2")).toDF("k", "f")
    val dim = Seq((1, "d1"), (1, "d1-dup"), (3, "d3")).toDF("k", "d")
    assert(RelationalOps.enrich(facts, dim, "k").count() == 2)
  }

  test("nullAudit counts per-column nulls in one row") {
    val df = Seq((Some(1), Option.empty[String]), (None, Some("x")))
      .toDF("a", "b")
    assert(RelationalOps.nullAudit(df, Seq("a", "b")).head() == Row(1L, 1L))
  }

  test("topK returns exactly k in metric order") {
    val df = (1 to 100).map(i => (i, i * 2.0)).toDF("id", "m")
    val out = RelationalOps.topK(df, 3, col("m").desc)
    assert(out.select("id").as[Int].collect().toSeq == Seq(100, 99, 98))
  }

  test("intervalOverlapJoinBucketed == naive non-equi overlap join, each pair once") {
    // intervals spanning 1 bucket, many buckets, touching endpoints,
    // disjoint, nested, and an inverted (dropped) one — tiny bucket
    // size (60s) forces multi-bucket overlap, the dedup-free case
    def iv(rows: Seq[(Int, String, String)], id: String, lo: String, hi: String) =
      rows.toDF(id, "l", "h")
        .select(col(id), to_timestamp(col("l")).as(lo), to_timestamp(col("h")).as(hi))
    val a = iv(Seq(
      (1, "2024-01-01 00:00:00", "2024-01-01 00:30:00"), // spans 31 buckets
      (2, "2024-01-01 01:00:00", "2024-01-01 01:00:30"),
      (3, "2024-01-01 02:00:00", "2024-01-01 03:00:00"),
      (4, "2024-01-01 05:00:00", "2024-01-01 04:00:00")  // inverted: no matches
    ), "a_id", "a_lo", "a_hi")
    val b = iv(Seq(
      (10, "2024-01-01 00:10:00", "2024-01-01 00:40:00"), // long overlap with 1
      (11, "2024-01-01 00:30:00", "2024-01-01 00:35:00"), // touches 1's endpoint
      (12, "2024-01-01 02:10:00", "2024-01-01 02:20:00"), // nested in 3
      (13, "2024-01-01 04:30:00", "2024-01-01 04:40:00")  // inside 4's inverted span
    ), "b_id", "b_lo", "b_hi")
    val got = RelationalOps.intervalOverlapJoinBucketed(
        a, "a_lo", "a_hi", b, "b_lo", "b_hi", bucketSeconds = 60L)
      .select("a_id", "b_id").as[(Int, Int)].collect().sorted.toSeq
    val want = a.join(b, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").as[(Int, Int)].collect().sorted.toSeq
    assert(got == want)
    assert(got == Seq((1, 10), (1, 11), (3, 12))) // and exactly once each
  }
}

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (3L, "completely different words entirely here now")
  ).toDF("doc_id", "text")

  test("exactDuplicates groups identical content") {
    val out = DedupOps.exactDuplicates(docs, "doc_id", "text")
    val dup = out.filter($"n_copies" === 2).head()
    assert(dup.getAs[Long]("keep_id") == 0L)
    assert(out.count() == 3) // 3 distinct contents
  }

  test("chunkDedup: repeated chunks kept only at first (doc, idx) occurrence") {
    // 4-token chunks; doc 10's two chunks reappear in doc 11 (one of
    // them twice) and doc 12 repeats its own first chunk
    val d = Seq(
      (10L, "a b c d e f g h"),          // chunks [a b c d][e f g h] — both first
      (11L, "e f g h x y z w a b c d"),  // [e f g h] dup, [x y z w] new, [a b c d] dup
      (12L, "p q r s p q r s")           // [p q r s] new, then self-dup
    ).toDF("doc_id", "text")
    val got = DedupOps.chunkDedup(d, "doc_id", "text", chunkTokens = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got(10L) == ((2L, 2L)))
    assert(got(11L) == ((3L, 1L)))
    assert(got(12L) == ((2L, 1L)))
  }

  test("repeatedSpans: shared boilerplate reported as ONE maximal span per doc") {
    // a 30-char boilerplate block embedded at different offsets in two
    // docs; k=10 windows inside it are all shared, and the islands
    // merge must recover exactly [offset, offset+29] in each doc
    val boiler = "BOILERPLATE-REPEATED-SEGMENT-X" // 30 chars
    val d = Seq(
      (1L, s"aaaaa${boiler}zzzzz"),           // span at 6..35
      (2L, s"qqqqqqqqqq${boiler}rrrrr"),      // span at 11..40
      (3L, "no shared content in this doc at all...")
    ).toDF("doc_id", "text")
    val got = DedupOps.repeatedSpans(d, "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(got(1L) == ((6, 35, 30)), s"doc 1 span ${got.get(1L)}")
    assert(got(2L) == ((11, 40, 30)), s"doc 2 span ${got.get(2L)}")
    assert(!got.contains(3L), "doc without cross-doc repeats emits no span")
  }

  test("repeatedSpans: same-doc repetition alone does not mark a span") {
    // the repeated block occurs twice in ONE doc but in no other doc —
    // cross-doc minDocs=2 must ignore it
    val d = Seq(
      (1L, "SAME-BLOCK-HERE!!SAME-BLOCK-HERE!!"),
      (2L, "totally unrelated text goes here....")
    ).toDF("doc_id", "text")
    assert(DedupOps.repeatedSpans(d, "doc_id", "text", k = 10).isEmpty)
  }

  test("repeatedSpans: two separated shared blocks stay two spans") {
    val a = "FIRST-SHARED-BLOCK-A"  // 20 chars
    val b = "SECOND-SHARED-BLOCK!"  // 20 chars
    val d = Seq(
      (1L, s"$a-----DIVIDER-----$b"),
      (2L, s"${b}___________________$a")
    ).toDF("doc_id", "text")
    val spans = DedupOps.repeatedSpans(d, "doc_id", "text", k = 12)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(spans.count(_._1 == 1L) == 2, s"doc 1 should carry two spans: ${spans.toSeq}")
    assert(spans.count(_._1 == 2L) == 2, s"doc 2 should carry two spans: ${spans.toSeq}")
    assert(spans.forall(_._2 == 20), s"each span is the 20-char block: ${spans.toSeq}")
  }

  test("chunkDedup: short tail chunk is its own unit, not merged or dropped") {
    // 5 tokens at chunk size 4 → chunks [a b c d][e]; the 1-token tail
    // of doc 20 matches nothing, doc 21's full text IS that tail chunk
    val d = Seq((20L, "a b c d e"), (21L, "e")).toDF("doc_id", "text")
    val got = DedupOps.chunkDedup(d, "doc_id", "text", chunkTokens = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got(20L) == ((2L, 2L))) // tail [e] first seen in doc 20
    assert(got(21L) == ((1L, 0L))) // doc 21's only chunk is a dup of the tail
  }

  test("incrementalExactBloom == incrementalExact, even with a tiny FP-heavy filter") {
    import spark.implicits._
    val hist = (0L until 200L).map(i => (i, s"seen document number $i"))
      .toDF("doc_id", "text")
    val batch = ((200L until 260L).map(i => (i, s"novel text $i")) ++
      Seq((300L, "seen document number 7"),   // exact re-sight → not novel
          (301L, "novel text 205"),           // dup of an in-batch doc
          (302L, "novel text 205"))           // triple
      ).toDF("doc_id", "text")
    val index = DedupOps.fingerprintIndex(hist, "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("fingerprint")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val exact = rows(DedupOps.incrementalExact(batch, "doc_id", "text", index))
    // generous sizing AND a 64-bit filter that false-positives heavily:
    // the answer must be identical either way (FPs ride the exact join)
    for (bits <- Seq(8000000L, 64L))
      assert(rows(DedupOps.incrementalExactBloom(
        batch, "doc_id", "text", index, expectedItems = 8L, numBits = bits)) == exact,
        s"numBits=$bits")
    assert(!exact.exists(_._1 == null))
    assert(exact.map(_._2).contains(200L) && !exact.map(_._2).contains(300L))
    // empty index: bloom aggregate yields null bytes — everything novel
    val emptyIdx = DedupOps.fingerprintIndex(hist.filter("doc_id < 0"), "text")
    assert(rows(DedupOps.incrementalExactBloom(batch, "doc_id", "text", emptyIdx)) ==
      rows(DedupOps.incrementalExact(batch, "doc_id", "text", emptyIdx)))
  }

  test("bpeTrain learns the hand-computed merges (Sennrich example, ties by pair asc)") {
    // corpus: low×5, lower×2, newest×6, widest×3
    // iter1 pair counts: es=9, st=9 (tie → 'e'<'s' wins), we=8, lo=7, ow=7 …
    // iter2 (after e+s→es): es,t = 9 (st was consumed by the es merge)
    // iter3 (after es+t→est): lo = 7 (we fell to 2 — newest's we is gone)
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = TokenizerOps.bpeTrain(docs, "text", iters = 3)
      .orderBy("iter")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
  }

  test("bpeTrain merge application is greedy-left (a a a + (a,a) -> aa a)") {
    // 'aaa'×4 and 'aa'×3: iter1 merges (a,a) cnt=4*2+3*1=11; after
    // applying, 'aaa' is [aa, a] (greedy-left, NOT [a, aa]) and 'aa'
    // is [aa] — so iter2 must see pair (aa, a) with cnt 4
    val docs = Seq((1L, (Seq.fill(4)("aaa") ++ Seq.fill(3)("aa")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TokenizerOps.bpeTrain(docs, "text", iters = 2)
      .orderBy("iter")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "a", 11L), (2, "aa", "a", 4L)))
  }

  test("bpeEncode applies learned merges greedy-left across a document") {
    // merges (a,a)→aa then (aa,a)→aaa: 'aaaa' → [aa,aa] after merge 1
    // (greedy-left pairs), then merge 2 finds no ' aa  a ' → [aa,aa];
    // 'aaa' → [aa,a] → [aaa]; words tokenize independently
    val df = Seq((1L, "aaaa aaa b ab")).toDF("doc_id", "text")
    val enc = df.select(TokenizerOps.bpeEncode($"text",
      Seq(("a", "a"), ("aa", "a"))).as("sym"))
      .as[Seq[String]].head()
    assert(enc == Seq("aa", "aa", "aaa", "b", "a", "b"))
  }

  test("bpeEncode with merges learned by bpeTrain reproduces training's corpus state") {
    // after training k merges, encoding the same corpus must yield
    // exactly the symbol stream training's corpus update produced —
    // i.e. pair counts over the encoded output match iteration k+1's
    // selected pair
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = TokenizerOps.bpeTrain(docs, "text", iters = 2)
      .orderBy("iter").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = docs.select(TokenizerOps.bpeEncode($"text", merges).as("sym"))
      .as[Seq[String]].head()
    // 'newest' → n e w est, 'widest' → w i d est after (e,s),(es,t)
    assert(enc.containsSlice(Seq("n", "e", "w", "est")))
    assert(enc.containsSlice(Seq("w", "i", "d", "est")))
    // next-best pair on the encoded stream is (l,o) with count 7 —
    // exactly what bpeTrain picks at iter 3
    val pairs = enc.sliding(2).toSeq.groupBy(identity).view.mapValues(_.size)
    assert(pairs(Seq("l", "o")) == 7)
  }

  test("incrementalNgramPairs == full pairs whose greater id is in the batch") {
    val history = docs.filter($"doc_id" < 2)
    val batch = docs.filter($"doc_id" >= 2)
    val full = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .filter($"id_b" >= 2)
      .select("id_a", "id_b", "shared", "n_a", "n_b", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val inc = DedupOps.incrementalNgramPairs(history, batch, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b", "shared", "n_a", "n_b", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(inc == full && inc.nonEmpty)
    // with the cap, both modes drop the same full-corpus hot shingles
    val fullCap = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.1,
        maxPosting = Some(2)).filter($"id_b" >= 2)
      .select("id_a", "id_b", "shared").as[(Long, Long, Long)].collect().toSet
    val incCap = DedupOps.incrementalNgramPairs(history, batch, "doc_id", "text",
        3, 0.1, maxPosting = Some(2))
      .select("id_a", "id_b", "shared").as[(Long, Long, Long)].collect().toSet
    assert(incCap == fullCap)
  }

  test("ngramJaccardPairs computes exact shingle Jaccard") {
    val out = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val pairs = out.select("id_a", "id_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // 9 tokens → 7 trigrams each; docs 0/1 share 6 of 8 distinct
    assert(pairs((0L, 2L)) == 1.0)
    assert(math.abs(pairs((0L, 1L)) - 6.0 / 8.0) < 1e-12)
    assert(!pairs.contains((0L, 3L)))
  }

  test("minHashLshPairs finds high-similarity pairs with exact verification") {
    val out = DedupOps.minHashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 8, rowsPerBand = 4, minSim = 0.5)
    val keys = out.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((0L, 2L))) // exact dup always collides
    val j02 = out.filter($"id_a" === 0 && $"id_b" === 2).select("jaccard").head().getDouble(0)
    assert(j02 == 1.0)
  }

  test("simHash: identical text → distance 0; simHashPairs surfaces it") {
    val out = DedupOps.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
    val p02 = out.filter($"id_a" === 0 && $"id_b" === 2).head()
    assert(p02.getAs[Long]("hamming") == 0L)
  }

  test("incrementalExact keeps only content the index has never seen") {
    val index = DedupOps.fingerprintIndex(docs, "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // known (doc 0)
      (11L, "brand new content in this batch"),
      (12L, "brand new content in this batch"),              // in-batch dup of 11
      (13L, "another novel document right here")
    ).toDF("doc_id", "text")
    val out = DedupOps.incrementalExact(batch, "doc_id", "text", index)
      .collect().map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(out == Map(11L -> 2L, 13L -> 1L),
      s"known content must be dropped, in-batch dups collapsed: $out")
    // the updated index covers both old and new content
    val updated = index.union(
      DedupOps.fingerprintIndex(batch, "text")).distinct()
    assert(DedupOps.incrementalExact(batch, "doc_id", "text", updated).count() == 0)
  }
}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("NgramGenerator == explode(token_ngrams), plus SQL LATERAL VIEW form") {
    import org.apache.spark.sql.functions.{col, posexplode, split}
    import org.apache.spark.sql.graftx.GraftFunctions
    val docs = Seq((1L, "a b c d"), (2L, "x y"), (3L, "")).toDF("doc_id", "text")
    val gen = docs.select(col("doc_id"),
        GraftFunctions.ngramGen(split(col("text"), " "), 3).as(Seq("pos", "ngram")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // the array-materializing twin (1-based pos via posexplode + 1)
    val arr = docs.select(col("doc_id"),
        posexplode(GraftFunctions.tokenNgrams(split(col("text"), " "), 3))
          .as(Seq("pos0", "ngram")))
      .collect().map(r => (r.getLong(0), r.getInt(1) + 1, r.getString(2))).toSet
    assert(gen == arr)
    assert(gen == Set((1L, 1, "a b c"), (1L, 2, "b c d"))) // short docs emit nothing
    // SQL surface via the injected function (LATERAL VIEW = UDTF position)
    docs.createOrReplaceTempView("ngg_docs")
    val sql = spark.sql("""SELECT doc_id, pos, ngram FROM ngg_docs
        LATERAL VIEW ngram_gen(split(text, ' '), 3) t AS pos, ngram""")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(sql == gen)
  }

  test("ngrams: shorter-than-n text yields empty array, not an error") {
    val df = Seq("one two", "a b c d").toDF("text")
      .select(size(TextFunctions.ngrams(col("text"), 3)).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(0, 2))
  }

  test("rollingHash is the documented modular fold") {
    val h = Seq("ab").toDF("text")
      .select(TextFunctions.rollingHash(col("text"))).as[Long].head()
    assert(h == (('a'.toInt * 31L) + 'b'.toInt) % 1000000007L)
  }

  test("quality score stays within [0,1]") {
    val df = Seq("the the the", "x " * 200).toDF("text")
      .select(TextFunctions.qualityScore(col("text")).as("q"))
    assert(df.as[Double].collect().forall(q => q >= 0.0 && q <= 1.0))
  }
}

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identity 1, orthogonal 0") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 2.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      SimilarityOps.cosine(col("a"), col("b")),
      SimilarityOps.cosine(col("a"), col("c"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
  }

  test("bruteForceTopK ranks nearest first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = SimilarityOps.bruteForceTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", 2)
    assert(out.select("neighbor_id").as[Long].collect().toSeq == Seq(1L, 2L))
  }

  test("centroids: elementwise means per cell") {
    val vecs = Seq((0, Array(1.0f, 3.0f)), (0, Array(3.0f, 5.0f)))
      .toDF("label", "embedding")
    val c = SimilarityOps.centroids(vecs, "label", "embedding")
      .select("centroid").as[Seq[Double]].head()
    assert(c == Seq(2.0, 4.0))
  }
}

class MultimodalSpec extends SparkSpec {
  import graft.multimodal.Multimodal

  test("decodeMeta: deterministic stub metadata, schema intact") {
    import spark.implicits._
    val docs = Seq((7L, "hello world")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, Multimodal.withPayload(docs)).head()
    assert(meta.n_bytes == 11L)
    assert(meta.width == 11 && meta.height == (77 % 480) && meta.format == "stub")
  }

  test("sampleFrames: stride sampling over fake frame count") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 30)).toDF("doc_id", "text") // 30 bytes → 7 frames
    val meta = Multimodal.decodeMeta(spark, Multimodal.withPayload(docs))
    val frames = Multimodal.sampleFrames(meta, everyK = 3)
    assert(frames.select("frame_idx").as[Int].collect().toSeq == Seq(0, 3, 6))
  }

  test("stubEmbedding: unit-norm, deterministic, flows into the similarity stack") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "identical media bytes"), (1L, "identical media bytes"),
      (2L, "completely different payload")).toDF("doc_id", "text")
    val emb = Multimodal.stubEmbedding(Multimodal.withPayload(docs), dim = 16)
    // unit norm
    val norms = emb.select(SimilarityOps.l2Norm(col("embedding"))).as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
    // same bytes → identical vectors; the cosine pair op finds exactly them
    val pairs = SimilarityOps.cosinePairs(emb, "doc_id", "embedding", minSim = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)), s"got $pairs")
    // re-extraction is bit-stable (content-deterministic, like the text ops)
    val emb2 = Multimodal.stubEmbedding(Multimodal.withPayload(docs), dim = 16)
    assert(emb.exceptAll(emb2).isEmpty)
    // the partition-iterator variant produces equally valid embeddings
    val embP = Multimodal.stubEmbeddingPartitions(spark, Multimodal.withPayload(docs), dim = 16)
    val normsP = embP.select(SimilarityOps.l2Norm(col("embedding"))).as[Double].collect()
    assert(normsP.forall(n => math.abs(n - 1.0) < 1e-5))
  }
}

class ApproxDistinctSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("approx_count_distinct stays within HLL++ error bounds vs exact") {
    import spark.implicits._
    val df = (1 to 20000).map(i => i % 3777).toDF("k")
    val (exact, approx) = df
      .agg(countDistinct($"k"), approx_count_distinct($"k", 0.02))
      .as[(Long, Long)].head()
    assert(exact == 3777)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}

class AsofJoinSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest right row at-or-before, ties resolved by seq") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 12:00:00")),
      (2L, 10L, ts("2024-01-01 09:00:00")), // before any right row
      (3L, 20L, ts("2024-01-01 10:00:00"))  // exactly at a right time
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 100L, "a"),
      (10L, ts("2024-01-01 11:00:00"), 101L, "b"),
      (20L, ts("2024-01-01 10:00:00"), 200L, "c"),
      (20L, ts("2024-01-01 10:00:00"), 201L, "d") // same time, higher seq wins
    ).toDF("k2", "t2", "seq", "payload")
    val out = RelationalOps.asofJoin(left, right,
      leftKey = "k", rightKey = "k2", leftTime = "t", rightTime = "t2",
      rightSeq = "seq", payload = Seq("payload"))
      .orderBy("event_id").select("event_id", "payload").as[(Long, Option[String])]
    assert(out.collect().toSeq == Seq(
      (1L, Some("b")),   // latest before 12:00 is 11:00/"b"
      (2L, None),        // nothing at or before 09:00
      (3L, Some("d")))) // tie at 10:00 → highest seq
  }

  test("asofJoin: payload comes atomically from the TRUE latest right row, genuine nulls kept") {
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("event_id", "k", "t")
    val right = Seq(
      // older row: both payload fields non-null
      (10L, ts("2024-01-01 10:00:00"), 100L, Option("old_a"), Option(1.5)),
      // LATEST row: payload_a is genuinely NULL, payload_b present
      (10L, ts("2024-01-01 11:00:00"), 101L, Option.empty[String], Option(2.5))
    ).toDF("k2", "t2", "seq", "payload_a", "payload_b")
    val out = RelationalOps.asofJoin(left, right,
      leftKey = "k", rightKey = "k2", leftTime = "t", rightTime = "t2",
      rightSeq = "seq", payload = Seq("payload_a", "payload_b"))
      .select("payload_a", "payload_b").as[(Option[String], Option[Double])].head()
    // per-column last(ignoreNulls) would wrongly return ("old_a", 2.5)
    assert(out == (None, Some(2.5)))
  }

  test("nearestAsofJoin: closer side wins, exact tie goes backward, one-sided rows covered") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:30:00")), // back 10:00 (30m) vs fwd 12:00 (90m) → back
      (2L, 10L, ts("2024-01-01 11:45:00")), // back 10:00 (105m) vs fwd 12:00 (15m) → fwd
      (3L, 10L, ts("2024-01-01 11:00:00")), // exact tie 60m/60m → backward
      (4L, 10L, ts("2024-01-01 08:00:00")), // only forward exists
      (5L, 10L, ts("2024-01-01 13:00:00")), // only backward exists
      (6L, 99L, ts("2024-01-01 13:00:00"))  // key with no right rows at all
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1L, "early"),
      (10L, ts("2024-01-01 12:00:00"), 2L, "late")
    ).toDF("k2", "t2", "seq", "payload")
    val out = RelationalOps.nearestAsofJoin(left, right,
      leftKey = "k", rightKey = "k2", leftTime = "t", rightTime = "t2",
      rightSeq = "seq", payload = Seq("payload"))
      .orderBy("event_id").select("event_id", "payload").as[(Long, Option[String])]
    assert(out.collect().toSeq == Seq(
      (1L, Some("early")), (2L, Some("late")), (3L, Some("early")),
      (4L, Some("early")), (5L, Some("late")), (6L, None)))
  }
}

class ConnectedComponentsSpec extends graft.SparkSpec {
  import spark.implicits._

  test("connectedComponents: chains collapse to min label; singletons keep own id") {
    val nodes = (0L to 6L).toDF("id")
    // chain 0-1-2-3, pair 4-5, singleton 6
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val out = RelationalOps.connectedComponents(nodes, "id", pairs, "a", "b")
      .orderBy("id").select("cluster_id").as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 0L, 0L, 4L, 4L, 6L))
  }

  test("editDistancePairs == brute-force levenshtein join (short strings, repeats)") {
    import org.apache.spark.sql.functions._
    val strs = Seq("red bolt", "red bolts", "blue bolt", "aaaa", "aaab", "aab",
      "small brushed ring", "small brushed king", "large brushed ring",
      "x", "xy", "completely unrelated phrase")
    val df = strs.zipWithIndex.map { case (s0, i) => (i.toLong, s0) }.toDF("id", "s")
    val fuzzy = graft.operators.FuzzyOps.editDistancePairs(df, "id", "s", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    val naive = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .withColumn("d", levenshtein(col("a.s"), col("b.s")).cast("long"))
      .filter(col("d") <= 2)
      .select(col("a.id"), col("b.id"), col("d"))
      .as[(Long, Long, Long)].collect().toSet
    assert(fuzzy == naive && naive.nonEmpty)
    // sanity: short bucket (aaaa/aaab, red bolt/red bolts) and the
    // gram path (ring/king) both contributed
    assert(naive.contains((3L, 4L, 1L)) && naive.contains((0L, 1L, 1L)) &&
      naive.contains((6L, 7L, 1L)))
  }

  test("editDistancePairs: multiset gram numbering on LONG repeated-gram strings") {
    import org.apache.spark.sql.functions._
    // strings long enough (> shortMax = 8 at q=3, k=2) to take the
    // GRAM path, with heavily repeated q-grams — the case the
    // occurrence index exists for (r14 moved occ from a corpus-wide
    // window into an in-row array fold; this pins the multiset join
    // key still counts true multiset intersection)
    val strs = Seq(
      "abcabcabcabc", "abcabcabcab", "abcabcabcabcabc",
      "aaaaaaaaaaaa", "aaaaaaaaaaab", "aaaaaaaaaaa",
      "xyxyxyxyxyxy", "xyxyxyxyxyxz", "totally different words here")
    val df = strs.zipWithIndex.map { case (s0, i) => (i.toLong, s0) }.toDF("id", "s")
    val fuzzy = graft.operators.FuzzyOps.editDistancePairs(df, "id", "s", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    val naive = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .withColumn("d", levenshtein(col("a.s"), col("b.s")).cast("long"))
      .filter(col("d") <= 2)
      .select(col("a.id"), col("b.id"), col("d"))
      .as[(Long, Long, Long)].collect().toSet
    assert(fuzzy == naive && naive.nonEmpty)
    // the all-repeat family must have matched through the gram path
    assert(naive.contains((3L, 4L, 1L)) && naive.contains((0L, 1L, 1L)))
  }

  test("mergeUpsert: matched updates, null-safe fallback, keeps, inserts") {
    val target = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("k", "bal", "tag")
    val source = Seq((2L, Some(99.0), "B"), (3L, None, "C"), (4L, Some(40.0), "d"))
      .toDF("k", "bal", "tag")
    val out = RelationalOps.mergeUpsert(target, source, "k", Seq("bal", "tag"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 10.0, "a", "kept"),        // untouched
      (2L, 99.0, "B", "updated"),     // source wins
      (3L, 30.0, "C", "updated"),     // null source bal → target's kept
      (4L, 40.0, "d", "inserted")))   // new key
  }

  test("rangeJoinBucketed == naive BETWEEN join; inclusive bounds; inverted intervals empty") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:59:59")),
      (3L, t("2024-01-01 13:00:00")), (4L, t("2024-01-01 23:30:00")),
      (5L, t("2024-01-02 00:30:00"))).toDF("event_id", "ts")
    val right = Seq(
      (100L, t("2024-01-01 10:00:00"), t("2024-01-01 10:59:59")), // exact bounds
      (200L, t("2024-01-01 09:30:00"), t("2024-01-01 14:00:00")), // spans 5 buckets
      (300L, t("2024-01-01 23:00:00"), t("2024-01-02 01:00:00")), // crosses midnight
      (400L, t("2024-01-01 12:00:00"), t("2024-01-01 11:00:00"))) // inverted
      .toDF("iv_id", "lo", "hi")
    val bucketed = RelationalOps.rangeJoinBucketed(left, "ts", right, "lo", "hi", 3600L)
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    val naive = left.join(right, col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(bucketed == Set((1L, 100L), (2L, 100L), (1L, 200L), (2L, 200L),
      (3L, 200L), (4L, 300L), (5L, 300L)))
  }

  test("canonicalPerCluster: best quality wins, ties to lowest id, singletons kept") {
    import org.apache.spark.sql.functions._
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_id")
    // cluster 0: doc 1 longest; cluster 4: tie between 4 and 5 → keep 4
    val quality = Seq((0L, 10L), (1L, 50L), (2L, 20L), (3L, 7L), (4L, 9L), (5L, 9L))
      .toDF("doc_id", "n_chars")
    val out = graft.operators.DedupOps
      .canonicalPerCluster(clusters, "doc_id", "cluster_id", quality, "doc_id", "n_chars")
      .orderBy("doc_id")
      .select("doc_id", "keep_id", "is_kept").as[(Long, Long, Boolean)]
      .collect().toSeq
    assert(out == Seq((0L, 1L, false), (1L, 1L, true), (2L, 1L, false),
      (3L, 3L, true), (4L, 4L, true), (5L, 4L, false)))
    // exactly one kept doc per cluster
    val perCluster = graft.operators.DedupOps
      .canonicalPerCluster(clusters, "doc_id", "cluster_id", quality, "doc_id", "n_chars")
      .groupBy("cluster_id")
      .agg(sum(when(col("is_kept"), 1).otherwise(0)).as("n_kept"))
      .select("n_kept").as[Long].collect()
    assert(perCluster.forall(_ == 1L))
  }
}

class SaltedAggSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("saltedAgg(sum/count) equals direct aggregation") {
    val df = (1 to 10000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    val salted = RelationalOps.saltedAgg(df, "k", salts = 16)(
      Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      Seq(sum("ps").as("s"), sum("pn").as("n")))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(salted == direct)
  }
}

class BinaryFileSourceSpec extends graft.SparkSpec {
  import graft.multimodal.Multimodal
  import org.apache.spark.sql.functions._

  test("binaryFile source feeds the multimodal decode path") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("media")
    Files.write(dir.resolve("img_1.bin"), Array.fill[Byte](640)(7))
    Files.write(dir.resolve("img_2.bin"), Array.fill[Byte](100)(9))

    val media = spark.read.format("binaryFile").load(dir.toString)
      .select(
        regexp_extract(col("path"), "img_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
        col("content").as("payload"))
    val meta = Multimodal.decodeMeta(spark, media).collect().sortBy(_.doc_id)
    assert(meta.map(_.n_bytes).toSeq == Seq(640L, 100L))
    assert(meta.head.width == 0) // 640 % 640
    assert(meta(1).width == 100)
  }
}

class HaversineSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("haversine: Hanoi to Ho Chi Minh City ~= 1140-1170 km; zero for same point") {
    val df = Seq((21.0285, 105.8542, 10.8231, 106.6297)).toDF("la1", "lo1", "la2", "lo2")
    val d = df.select(graft.functions.GeoFunctions.haversineKm(
      col("la1"), col("lo1"), col("la2"), col("lo2"))).as[Double].head()
    assert(d > 1120 && d < 1180, s"got $d km")
    val z = df.select(graft.functions.GeoFunctions.haversineKm(
      col("la1"), col("lo1"), col("la1"), col("lo1"))).as[Double].head()
    assert(z == 0.0)
  }

  test("withinRadiusGridJoin == brute force, incl. antimeridian pairs, each once") {
    import graft.functions.GeoFunctions
    // deterministic pseudo-random points in |lat|<=55, full lon range,
    // plus a planted pair straddling ±180 (172 km apart at lat 40)
    val aPts = ((1 to 60).map { i =>
      (i.toLong, (i * 37 % 110) - 55.0, (i * 73 % 360) - 180.0)
    } :+ (999L, 40.0, 179.5)).toDF("a_id", "a_lat", "a_lon")
    val bPts = ((1 to 60).map { i =>
      (i.toLong, (i * 53 % 110) - 55.0, (i * 29 % 360) - 180.0)
    } :+ (888L, 40.0, -179.5)).toDF("b_id", "b_lat", "b_lon")
    val got = GeoFunctions.withinRadiusGridJoin(
        aPts, "a_lat", "a_lon", bPts, "b_lat", "b_lon",
        radiusKm = 2000.0, cellDeg = 40.0)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = aPts.join(bPts, GeoFunctions.haversineKm(
        col("a_lat"), col("a_lon"), col("b_lat"), col("b_lon")) <= 2000.0)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == want.sorted) // multiset equality: no dups, no misses
    assert(got.contains((999L, 888L)), "the antimeridian pair must be found")
  }

  test("paretoFront2D == naive NOT EXISTS dominance, ties and duplicates included") {
    // adversarial grid: duplicate (min,max) pairs, min-ties with
    // different max, a strictly dominated diagonal
    val rows = (for (i <- 1 to 40) yield
      (i.toLong, (i * 17 % 13).toDouble, (i * 31 % 11).toLong)) ++
      Seq((100L, 3.0, 9L), (101L, 3.0, 9L)) // exact duplicates survive together
    val df = rows.toDF("id", "cost", "size")
    val got = graft.operators.RelationalOps.paretoFront2D(df, "cost", "size")
      .select("id").as[Long].collect().toSet
    val all = rows
    val want = all.filter { case (_, cb, sb) =>
      !all.exists { case (_, ca, sa) =>
        ca <= cb && sa >= sb && (ca < cb || sa > sb)
      }
    }.map(_._1).toSet
    assert(got == want)
    assert(got.contains(100L) && got.contains(101L) ||
      !want.contains(100L), "duplicate handling must match naive semantics")
  }
}
