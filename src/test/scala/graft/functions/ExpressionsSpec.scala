package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.GraftFunctions
import graft.SparkSpec

/** Specs for the native graftx expressions: each one must agree
  * exactly with the composable higher-order-function formulation it
  * replaced (that equivalence is what keeps the DuckDB oracles valid).
  */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("FloatVecDot == aggregate(zip_with(...)) fold, bit for bit") {
    val df = Seq(
      (Array(1.1f, -2.2f, 3.3f), Array(0.5f, 0.25f, -4.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val hof = aggregate(
      zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = df.select(
      (GraftFunctions.vecDot($"a", $"b") - hof).as("d")).as[Double].collect()
    assert(diff.forall(_ == 0.0)) // exact, not approximate
  }

  test("FloatVecDot: null array propagates null") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(GraftFunctions.vecDot($"a", $"b")).head().isNullAt(0))
  }

  test("TokenNgrams matches hand-built trigrams and guards short input") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(GraftFunctions.tokenNgrams(split($"t", " "), 3).as("ng"))
    val got = df.as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
  }

  test("SimHash64: identical token arrays → identical signatures; different → different") {
    val df = Seq("x y z", "x y z", "p q r s t u v w").toDF("t")
      .select(GraftFunctions.simHash64(split($"t", " ")).as("h"))
    val hs = df.as[Long].collect()
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
  }

  test("MinHashSignature: length k, permutation-invariant on set equality") {
    val df = Seq(Seq("a", "b", "c"), Seq("c", "a", "b"), Seq("a", "b", "x"))
      .toDF("s")
      .select(GraftFunctions.minHashSignature($"s", 16).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs.forall(_.length == 16))
    assert(sigs(0) == sigs(1)) // min over a set ignores order
    assert(sigs(0) != sigs(2))
    // matching fraction estimates Jaccard(2/4 = .5) loosely
    val matches = sigs(0).zip(sigs(2)).count { case (x, y) => x == y }
    assert(matches > 0 && matches < 16)
  }

  test("RhpSignature: deterministic; similar vectors collide more than dissimilar") {
    val df = Seq(
      Array(1.0f, 0.0f, 0.5f, 0.2f),
      Array(1.0f, 0.01f, 0.5f, 0.2f),
      Array(-1.0f, 0.3f, -0.5f, -0.2f)).toDF("v")
      .select(GraftFunctions.rhpSignature($"v", 4, 16).as("sig"))
    val s = df.as[Long].collect()
    assert(s(0) == s(1)) // near-identical vectors share all sign bits
    assert(java.lang.Long.bitCount(s(0) ^ s(2)) > 4) // opposite vector flips many
  }

  test("SQL registration: float_vec_dot callable from spark.sql") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT float_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head().getDouble(0)
    assert(r == 11.0)
  }
}

/** The SparkSessionExtensions path: TestSpark builds its session with
  * `.withExtensions(new GraftExtensions)`, so the SQL functions must
  * resolve without any explicit registerAll call.
  */
class ExtensionsSpec extends graft.SparkSpec {
  test("extension-injected SQL functions resolve") {
    val r = spark.sql(
      """SELECT
        |  simhash64(array('a','b')) AS sh,
        |  token_ngrams(array('a','b','c','d')) AS ng,
        |  rhp_signature64(array_repeat(CAST(0.5 AS FLOAT), 64)) AS bucket
        |""".stripMargin).head()
    assert(!r.isNullAt(0))
    assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(r.getLong(2) >= 0L)
  }

  test("extension-injected aggregate mg_heavy_hitters resolves in SQL GROUP BY") {
    import spark.implicits._
    Seq("a", "a", "a", "b").toDF("t").createOrReplaceTempView("mg_in")
    val hh = spark.sql(
      "SELECT mg_heavy_hitters(t) AS hh FROM mg_in")
      .selectExpr("inline(hh)").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == Map("a" -> 3L, "b" -> 1L))
  }

  test("token_ngrams honors an explicit n and skips null-token windows") {
    // n=2 must yield bigrams, not silently fall back to trigrams
    val bi = spark.sql("SELECT token_ngrams(array('a','b','c'), 2) AS ng")
      .head().getSeq[String](0)
    assert(bi == Seq("a b", "b c"))
    // a null element must not NPE; windows containing it are skipped
    val withNull = spark.sql(
      "SELECT token_ngrams(array('a', CAST(NULL AS STRING), 'b', 'c', 'd'), 2) AS ng")
      .head().getSeq[String](0)
    assert(withNull == Seq("b c", "c d"))
    val gen = spark.sql(
      "SELECT ngram_gen(array('a', CAST(NULL AS STRING), 'b', 'c'), 2) AS (pos, ng)")
      .collect().map(_.getString(1)).toSeq
    assert(gen == Seq("b c"))
  }

  test("float_vec_dot refuses mismatched vector lengths loudly") {
    val e = intercept[Exception] {
      spark.sql("""SELECT float_vec_dot(
        array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        array(CAST(1.0 AS FLOAT)))""").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("vector lengths differ")), e.toString)
  }

  test("WindowHashes: slot j == hash of substring(s, j+1, k); equal windows collide") {
    import spark.implicits._
    val s = "abcabcxabc"
    val k = 3
    val df = Seq(s).toDF("t")
    val all = df.select(GraftFunctions.windowHashes($"t", k).as("h"))
      .as[Seq[Long]].head()
    assert(all.length == s.length - k + 1)
    // rolling value at j equals a fresh hash of just that window
    (0 until all.length).foreach { j =>
      val single = Seq(s.substring(j, j + k)).toDF("t")
        .select(GraftFunctions.windowHashes($"t", k).as("h"))
        .as[Seq[Long]].head()
      assert(all(j) == single.head, s"pos $j")
    }
    // identical substrings ("abc" at 0, 3, 7) share a hash
    assert(all(0) == all(3) && all(3) == all(7))
    assert(all(0) != all(1))
  }

  test("WindowHashes: codepoint positions (multibyte), short input, empty") {
    import spark.implicits._
    // 'é' is 2 bytes / 1 codepoint: windows advance by CODEPOINT like
    // SQL substring, so "ééa" with k=2 has 2 windows
    val r = Seq(("ééaééa", "é", "")).toDF("a", "b", "c")
      .select(GraftFunctions.windowHashes($"a", 2).as("ha"),
        GraftFunctions.windowHashes($"b", 2).as("hb"),
        GraftFunctions.windowHashes($"c", 2).as("hc"))
      .head()
    val ha = r.getSeq[Long](0)
    assert(ha.length == 5)
    assert(ha(0) == ha(3)) // "éé" repeats at codepoint 1 and 4
    assert(r.getSeq[Long](1).isEmpty && r.getSeq[Long](2).isEmpty)
  }

  test("PqAdcDot == the HOF lookup fold, bit for bit; out-of-range code throws") {
    import spark.implicits._
    val ksub = 4; val m = 3
    // deterministic pseudo-random codes + tables
    val rows = (0 until 50).map { i =>
      val codes = (0 until m).map(s => (i * 7 + s * 3) % ksub)
      val qtab = (0 until m * ksub).map(j => (i * 31 + j * 17) % 100 / 7.0)
      (codes, qtab)
    }.toDF("codes", "qtab")
    val got = rows.select(
        GraftFunctions.pqAdcDot($"codes", $"qtab", ksub).as("native"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, s) => acc + element_at($"qtab",
            s * ksub + element_at($"codes", s + 1) + 1)).as("hof"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}"))
    // a code >= ksub would read a NEIGHBOR subspace's slot — loud, not wrong
    val bad = Seq((Seq(0, ksub, 0), (0 until m * ksub).map(_.toDouble)))
      .toDF("codes", "qtab")
    val e = intercept[Exception] {
      bad.select(GraftFunctions.pqAdcDot($"codes", $"qtab", ksub)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("pq_adc_dot") ||
      Option(e.getCause).exists(_.getMessage.contains("pq_adc_dot")))
    // a NULL code slot would read as code 0 (ArrayData.getInt) — a
    // plausible wrong similarity; must throw instead
    val nullCode = Seq((Seq(Some(0), None, Some(1)),
      (0 until m * ksub).map(_.toDouble))).toDF("codes", "qtab")
    val e3 = intercept[Exception] {
      nullCode.select(GraftFunctions.pqAdcDot($"codes", $"qtab", ksub)).collect()
    }
    assert(e3.getMessage.contains("null code") ||
      Option(e3.getCause).exists(_.getMessage.contains("null code")))
    // a NULL lookup-TABLE slot would unbox to 0.0 (ArrayData.getDouble)
    // — the same plausible-wrong-similarity shape; must throw too
    // (pq_adc_dot is public SQL surface, so a caller-built qtab with a
    // missed-lookup hole is a realistic input)
    // codes (0,1,2) at ksub=4 read slots 0, 5, 10 — hole at slot 5
    val nullTab = Seq((Seq(0, 1, 2),
      (0 until m * ksub).map(j => if (j == 5) None else Some(j.toDouble))))
      .toDF("codes", "qtab")
    val e4 = intercept[Exception] {
      nullTab.select(GraftFunctions.pqAdcDot($"codes", $"qtab", ksub)).collect()
    }
    assert(e4.getMessage.contains("null lookup-table") ||
      Option(e4.getCause).exists(_.getMessage.contains("null lookup-table")))
    // SQL surface (extension-injected; ksub must be a literal)
    rows.createOrReplaceTempView("pq_rows")
    val viaSql = spark.sql(
      s"SELECT pq_adc_dot(codes, qtab, $ksub) AS d FROM pq_rows")
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(viaSql == got.map(_.getDouble(0)).sorted.toSeq)
    val e2 = intercept[Exception] {
      spark.sql("SELECT pq_adc_dot(codes, qtab, codes[0]) FROM pq_rows").collect()
    }
    assert(e2.getMessage.contains("literal"))
  }
}
