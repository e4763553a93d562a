package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity expressions Spark lacks natively:
  * unrestricted Damerau-Levenshtein (transposed substrings may be
  * edited again — the `da`-array dynamic program, NOT the cheaper
  * optimal-string-alignment variant) and Jaro / Jaro-Winkler.
  *
  * Semantics are pinned to DuckDB's builtins of the same names
  * (`damerau_levenshtein`, `jaro_similarity`,
  * `jaro_winkler_similarity`) so the driver oracle can hash-match:
  * validated bit-identical on 3k sampled `p_name` pairs + edge cases
  * (empty strings, `'CA'/'ABC'` = 2 distinguishing full-DL from OSA's
  * 3, `martha/marhta`, runs of repeated chars). Jaro-Winkler applies
  * the prefix boost only when jaro > 0.7 (Winkler's boost threshold),
  * prefix capped at 4, scaling 0.1 — the standard constants DuckDB
  * uses. Arithmetic order in [[GraftFuzzyOps.jaro]] matches theirs,
  * so DOUBLE results are bit-identical, not merely close.
  *
  * The loops live in static helpers so whole-stage codegen emits one
  * call (same pattern as [[GraftHashOps]]); per-row scratch arrays are
  * allocated per call — O(len) ints, dwarfed by the O(len²) DP work.
  */
object GraftFuzzyOps {

  /** Unrestricted Damerau-Levenshtein distance over UTF-16 code units
    * (our corpora are BMP; matches DuckDB on them).
    */
  def damerauLevenshtein(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    // O(la·lb) ints: unguarded, two ~47k-char strings overflow the
    // array size into NegativeArraySizeException (and well before
    // that allocate gigabytes). Edit distance on whole documents is
    // the wrong tool — q-gram-block + verify (FuzzyOps) is the
    // scalable path — so refuse loudly past a 16M-cell budget (64 MB
    // scratch), instead of dying mid-task with an opaque error.
    if (la.toLong * lb > 16L * 1024 * 1024)
      throw new IllegalArgumentException(
        s"damerau_levenshtein: ${la}x$lb chars exceeds the 16M-cell DP budget; " +
          "block long texts (FuzzyOps q-gram candidates) before exact verify")
    val maxd = la + lb
    // last row index (1-based) at which each char of `a` was seen
    val da = new java.util.HashMap[Character, Integer]()
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    @inline def get(i: Int, j: Int) = d(i * w + j)
    @inline def set(i: Int, j: Int, v: Int): Unit = d(i * w + j) = v
    set(0, 0, maxd)
    var i = 0
    while (i <= la) { set(i + 1, 0, maxd); set(i + 1, 1, i); i += 1 }
    var j = 0
    while (j <= lb) { set(0, j + 1, maxd); set(1, j + 1, j); j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k: Int = { val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        var m = get(i, j) + cost // substitute / match
        val ins = get(i + 1, j) + 1
        if (ins < m) m = ins
        val del = get(i, j + 1) + 1
        if (del < m) m = del
        val tr = get(k, l) + (i - k - 1) + 1 + (j - l - 1) // transpose
        if (tr < m) m = tr
        set(i + 1, j + 1, m)
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    get(la + 1, lb + 1)
  }

  /** Jaro similarity; division order `(m/la + m/lb + (m-t)/m) / 3`. */
  def jaro(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val c = a.charAt(i)
      var j = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && b.charAt(j) == c) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
  }

  /** Jaro-Winkler: prefix boost (≤4 chars, 0.1 scaling) only when
    * jaro exceeds the 0.7 boost threshold.
    */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val sim = jaro(ua, ub)
    if (sim <= 0.7) return sim
    val a = ua.toString
    val b = ub.toString
    val n = math.min(4, math.min(a.length, b.length))
    var l = 0
    while (l < n && a.charAt(l) == b.charAt(l)) l += 1
    sim + 0.1 * l * (1.0 - sim)
  }
}

private[graftx] trait FuzzyBinaryString extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  /** Fully-qualified static call emitted into generated code. */
  protected def staticCall: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftx.GraftFuzzyOps.$staticCall($a, $b);")
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends FuzzyBinaryString {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"
  override protected def staticCall: String = "damerauLevenshtein"
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftFuzzyOps.damerauLevenshtein(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class JaroSimilarity(left: Expression, right: Expression)
    extends FuzzyBinaryString {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_similarity"
  override protected def staticCall: String = "jaro"
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftFuzzyOps.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends FuzzyBinaryString {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_similarity"
  override protected def staticCall: String = "jaroWinkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftFuzzyOps.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object GraftFuzzy {
  private def expr(c: Column): Expression = ExpressionUtils.expression(c)

  def damerauLevenshtein(a: Column, b: Column): Column =
    ExpressionUtils.column(DamerauLevenshtein(expr(a), expr(b)))

  def jaroSimilarity(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroSimilarity(expr(a), expr(b)))

  def jaroWinklerSimilarity(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinklerSimilarity(expr(a), expr(b)))

  /** SQL surface (`SELECT damerau_levenshtein(a, b)` …). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("damerau_levenshtein",
      es => DamerauLevenshtein(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("jaro_similarity",
      es => JaroSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("jaro_winkler_similarity",
      es => JaroWinklerSimilarity(es.head, es(1)), "built-in")
  }
}
