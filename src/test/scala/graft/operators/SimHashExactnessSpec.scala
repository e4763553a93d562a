package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Exactness of the SimHash pigeonhole join — the least-verified
  * dedup path until now. The 4×16-band construction GUARANTEES that
  * any signature pair within Hamming distance 3 agrees on at least
  * one band (3 differing bits can spoil at most 3 of 4 bands), so
  * `simHashPairs` must equal the brute-force all-pairs
  * `bit_count(xor) <= 3` set EXACTLY — recall 1.0 by pigeonhole,
  * precision 1.0 by the bit_count verification. Asserted on the real
  * sf0.01 documents corpus (the dd_simhash query's own table, where
  * the brute-force twin is still tractable) and on planted
  * single-token edits.
  */
class SimHashExactnessSpec extends SparkSpec {
  import spark.implicits._

  private def exactPairs(sigs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.sim").bitwiseXOR(col("b.sim"))) <= 3)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet

  test("simHashPairs == brute-force Hamming<=3 set on the real documents corpus") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val sigs = docs.select(col("doc_id"), DedupOps.simHash(col("text")).as("sim"))
    val exact = exactPairs(sigs)
    val banded = DedupOps.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == exact,
      s"banded ${banded.size} vs exact ${exact.size}; missing=${(exact -- banded).take(3)}, extra=${(banded -- exact).take(3)}")
  }

  test("planted single-token edits are recovered") {
    // 60-token documents with one token swapped flip few majority
    // votes — most land within Hamming 3 of their source
    val base = (0 until 30).map { d =>
      (d.toLong, (0 until 60).map(t => s"tok${d}_$t").mkString(" "))
    }
    val edited = base.map { case (d, text) =>
      (1000L + d, text.replace(s"tok${d}_30", "EDITED"))
    }
    val docs = (base ++ edited).toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"), DedupOps.simHash(col("text")).as("sim"))
    val exact = exactPairs(sigs)
    assert(exact.nonEmpty, "planted edits must produce Hamming<=3 pairs")
    val banded = DedupOps.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == exact, s"banded ${banded.size} vs exact ${exact.size}")
  }
}
