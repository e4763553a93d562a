package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Curation-operator semantics on planted documents: contamination
  * flags exactly the docs sharing a benchmark shingle, repetition
  * gates fire on degenerate text, and hash sampling is deterministic
  * and monotone in the rate.
  */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  private val benchDoc = "alpha beta gamma delta epsilon zeta eta theta"

  test("contaminationScan flags overlap with the benchmark set, broadcast plan") {
    val bench = Seq((0L, benchDoc)).toDF("doc_id", "text")
    val corpus = Seq(
      // shares the 5-gram "beta gamma delta epsilon zeta" inside other text
      (1L, "prefix beta gamma delta epsilon zeta suffix words here"),
      // same vocabulary, different order — no shared 5-gram
      (2L, "zeta alpha gamma beta epsilon delta theta eta words here"),
      (3L, "completely unrelated tokens one two three four five six")
    ).toDF("doc_id", "text")

    val out = QualityOps.contaminationScan(corpus, bench, "doc_id", "text", n = 5)
    val byId = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(byId(1L)._2 && byId(1L)._1 >= 1, "planted overlap must be flagged")
    assert(byId(2L) == (0L, false), "shuffled vocabulary is not contamination")
    assert(byId(3L) == (0L, false))

    // benchmark shingles must broadcast: the gram join is a BroadcastHashJoin
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast, got:\n$plan")
  }

  test("repetitionMetrics gates degenerate text and passes varied text") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),       // one token, one bigram
      (2L, "the quick brown fox jumps over a lazy dog"),     // all distinct
      (3L, "ab cd ab cd ab cd ab cd ab cd")                  // 2 tokens, dominant bigram
    ).toDF("doc_id", "text")
    val m = QualityOps.repetitionMetrics(docs, "doc_id", "text",
      maxDupTokenFrac = 0.5, maxTopBigramFrac = 0.5).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(m(1L)._1 == 1.0 - 1.0 / 8 && m(1L)._2 == 1.0 && !m(1L)._3)
    assert(m(2L)._1 == 0.0 && m(2L)._2 == 1.0 / 8 && m(2L)._3)
    assert(!m(3L)._3, "alternating two-token text must fail the dup-token gate")
  }

  test("hashSampled: deterministic, monotone in the nibble threshold, exact at 0 and 16") {
    val docs = (0 until 200).map(i => (i.toLong, s"document number $i content"))
      .toDF("doc_id", "text")
    def sampledIds(k: Int): Set[Long] = docs
      .filter(QualityOps.hashSampled(col("text"), lit(QualityOps.nibbleChar(k))))
      .select("doc_id").as[Long].collect().toSet
    assert(sampledIds(0).isEmpty)
    assert(sampledIds(16).size == 200)
    val s4 = sampledIds(4); val s12 = sampledIds(12)
    assert(s4.subsetOf(s12), "raising the rate must only add rows")
    assert(s4 == sampledIds(4), "content-hash sampling is reproducible")
    // ~4/16 and ~12/16 of rows, loose tolerance at n=200
    assert(s4.size > 20 && s4.size < 80, s"got ${s4.size}")
    assert(s12.size > 110 && s12.size < 180, s"got ${s12.size}")
  }

  test("keySkewReport: a planted hot key dominates exactly one bucket; uniform keys stay near 1.0") {
    // 3200 rows over 3200 distinct keys → every bucket's skew ≈ 1;
    // then one key repeated 3200× concentrates in its single hash
    // bucket and must show skew ≫ 1 there
    val uniform = (0 until 3200).map(i => Tuple1(i.toLong)).toDF("k")
    val even = QualityOps.keySkewReport(uniform, "k", buckets = 32)
      .select("skew").as[Double].collect()
    assert(even.forall(s => s > 0.5 && s < 1.6), s"uniform skew out of band: ${even.max}")
    val hot = uniform.union(Seq.fill(3200)(Tuple1(7L)).toDF("k"))
    val rep = QualityOps.keySkewReport(hot, "k", buckets = 32)
      .select("bucket", "skew").as[(Long, Double)].collect()
    assert(rep.count(_._2 > 5.0) == 1,
      s"exactly one hot bucket expected: ${rep.sortBy(-_._2).take(3).toSeq}")
    val total = rep.map(_._2).sum / 32
    assert(math.abs(total - 1.0) < 0.01, s"skew factors must average to 1, got $total")
  }
}
