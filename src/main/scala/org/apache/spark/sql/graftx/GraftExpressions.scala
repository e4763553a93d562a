package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Generator, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot paths where composable
  * higher-order functions (`aggregate`/`transform`/`zip_with`) are
  * interpreted per element and fall out of whole-stage codegen
  * (SURVEY §7.3 preference order: custom `Expression` before custom
  * operators). Lives under `org.apache.spark.sql` to use the
  * `private[sql]` expression-to-Column bridge, the standard extension
  * technique.
  */

/** Native dot product of two `array<float>` columns, accumulated in
  * DOUBLE precision sequentially in index order — bit-identical to the
  * `aggregate(zip_with(...))` fold AND to DuckDB `list_reduce`, so
  * oracle hash-matching is preserved while gaining a codegen'd
  * primitive loop. Null array → null; arrays are dense by contract.
  * A LENGTH MISMATCH throws: silently dotting the common prefix would
  * turn an upstream data bug (truncated embedding) into plausible but
  * wrong similarity scores.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    GraftHashOps.checkSameLength(x.numElements(), y.numElements())
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |org.apache.spark.sql.graftx.GraftHashOps.checkSameLength(
         |  $a.numElements(), $b.numElements());
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[FloatVecDot]] for float/double arrays in any combination — the
  * native replacement for the `aggregate(zip_with(x·y))` HOF fold that
  * scores every (vector, centroid) pair in IVF assignment, coarse-cell
  * probing, and ADC table construction. The HOF form is interpreted
  * per element; at toy geometry (8 cells) that never mattered, but
  * production geometry scales cells ~4√n, making assignment an
  * n × 4√n × dim loop — the widest in the engine — where interpreted
  * arithmetic is the difference between minutes and hours at the 2M
  * decade. Semantics are BIT-IDENTICAL to the HOF fold
  * (NumVecDotSpec pins it element-for-element): double accumulation in
  * index order; a null ELEMENT or a length mismatch yields null (the
  * fold's `acc + null` / zip_with null-padding behavior) — unlike
  * FloatVecDot, which serves dense-by-contract embedding columns and
  * throws on mismatch, this serves arbitrary caller arrays exactly as
  * the HOF did.
  */
case class NumVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "num_vec_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val leftFloat = isFloat(left)
  private lazy val rightFloat = isFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // zip_with null-pads the short side
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // fold: acc + null
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, float: Boolean) =
        if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(a, leftFloat)} * ${get(b, rightFloat)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IvfArgMin {
  /** Flat driver-built centroid table, broadcast to executors: cell
    * ids ascending, per-cell norms, centroids row-major in `flat`. */
  final class Cents(val cells: Array[Int], val cns: Array[Double],
                    val flat: Array[Double], val dim: Int)
    extends Serializable {
    def nCells: Int = cells.length
  }
}

/** IVF nearest-centroid assignment over a DRIVER-BUILT broadcast
  * centroid table — the scoring loop of the coarse quantizer, run
  * once per corpus row. Returns struct(cell, cos) of the
  * highest-cosine cell (ties to the lower cell id), null for a null
  * vector or null element (callers pre-filter those rows — the old
  * inner join dropped them).
  *
  * Two earlier shapes died by measurement. The join-then-min(struct)
  * aggregation planned SortAggregate and sorted the n·k scored stream
  * (~300 GB spill at 2M × 5660 cells). Its replacement kept the
  * argmin in one expression but fed the packed table through a
  * crossJoin(broadcast) COLUMN — and the join's result projection
  * copies every output row into a fresh UnsafeRow, so each corpus row
  * paid an O(nCells·dim) pack memcpy plus re-unpacking (region-keyed
  * memoization cannot hit when the backing bytes are new every row):
  * measured 2.3 G madds/s with GC burning ~40% of the wall. The
  * centroid table is MODEL PARAMETERS (k·dim doubles, KB–MB — the
  * driver never sees corpus rows), so it now rides a Spark Broadcast
  * captured by the expression: the plan is a pure map-side Project
  * over the corpus scan — no join, no per-row copy, one deserialized
  * table per executor JVM shared by every core (at the production
  * 4√n geometry, per-task copies would fall out of the shared L3).
  *
  * Arithmetic is bit-compatible with BOTH prior formulations
  * (IvfAssignParitySpec pins equality): dots accumulate in double in
  * index order from 0.0; the best is the min under Spark's
  * SQLOrderingUtil.compareDoubles on (−cos, cell) — ties −0.0/0.0,
  * sinks NaN below every real candidate — exactly min(struct(−cos,
  * cell)). Eight centroids per pass: independent accumulator chains
  * break the FP-add-latency dependency while each dot's own
  * accumulation order is unchanged.
  *
  * CodegenFallback: the value is a struct (no primitive ExprCode
  * shape) and the per-row work is the k·dim flop loop itself, so the
  * fallback's per-ROW boxing is noise.
  */
case class IvfArgMin(vec: Expression,
                     cents: org.apache.spark.broadcast.Broadcast[IvfArgMin.Cents])
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def child: Expression = vec
  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_arg_min"

  private lazy val vecFloat = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val pk = cents.value

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val d = x.numElements()
    val nCells = pk.nCells
    if (nCells == 0) return null
    // vector elements once into a double buffer (cast order = the
    // transform(cast) projection) — BEFORE the length check,
    // preserving the original null-over-throw precedence for a null
    // element in a mismatched-length vector
    val vd = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (x.isNullAt(i)) return null
      vd(i) = if (vecFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    GraftHashOps.checkSameLength(pk.dim, d)
    var nn = 0.0
    i = 0
    while (i < d) { nn += vd(i) * vd(i); i += 1 }
    val vn = math.sqrt(nn)
    val ids = pk.cells; val cns = pk.cns; val flat = pk.flat
    var bestCell = 0
    var bestCos = 0.0
    var first = true
    @inline def consider(cell: Int, cos: Double): Unit = {
      val cmp = if (first) -1
        else org.apache.spark.sql.catalyst.util.SQLOrderingUtil
          .compareDoubles(-cos, -bestCos)
      if (cmp < 0 || (cmp == 0 && cell < bestCell)) {
        bestCell = cell; bestCos = cos
      }
      first = false
    }
    @inline def cosOf(c: Int, dot: Double): Double =
      if (vn * cns(c) > 0) dot / (vn * cns(c)) else -1.0
    var c = 0
    while (c + 8 <= nCells) {
      val b0 = c * d
      var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
      var d4 = 0.0; var d5 = 0.0; var d6 = 0.0; var d7 = 0.0
      i = 0
      while (i < d) {
        val xi = vd(i)
        val b = b0 + i
        d0 += xi * flat(b); d1 += xi * flat(b + d)
        d2 += xi * flat(b + 2 * d); d3 += xi * flat(b + 3 * d)
        d4 += xi * flat(b + 4 * d); d5 += xi * flat(b + 5 * d)
        d6 += xi * flat(b + 6 * d); d7 += xi * flat(b + 7 * d)
        i += 1
      }
      consider(ids(c), cosOf(c, d0)); consider(ids(c + 1), cosOf(c + 1, d1))
      consider(ids(c + 2), cosOf(c + 2, d2)); consider(ids(c + 3), cosOf(c + 3, d3))
      consider(ids(c + 4), cosOf(c + 4, d4)); consider(ids(c + 5), cosOf(c + 5, d5))
      consider(ids(c + 6), cosOf(c + 6, d6)); consider(ids(c + 7), cosOf(c + 7, d7))
      c += 8
    }
    while (c < nCells) {
      val base = c * d
      var dot = 0.0
      i = 0
      while (i < d) { dot += vd(i) * flat(base + i); i += 1 }
      consider(ids(c), cosOf(c, dot))
      c += 1
    }
    InternalRow(bestCell, bestCos)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(vec = newChild)
}

/** PQ asymmetric-distance accumulation: for codes `c` (array<int>,
  * one per subspace) and a per-query dense lookup table `qtab`
  * (array<double>, indexed `sub·ksub + cell`), returns
  * Σ_s qtab[s·ksub + c[s]] — the approximate dot product of the
  * query against a product-quantized corpus vector. This runs once
  * per (query, corpus-vector) pair, the widest loop in PQ search; the
  * HOF form (`aggregate(sequence)` with two `element_at`s per step)
  * is interpreted per element and measured at 1.2× the cost of the
  * full 64-float brute-force dot at n=2M — erasing the compression
  * win on the CPU axis. This codegen'd loop is m array loads + adds.
  * An out-of-range code throws: reading a neighbors' slot would turn
  * an encode/geometry bug into plausible but wrong similarities.
  */
case class PqAdcDot(codes: Expression, qtab: Expression, ksub: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = codes
  override def right: Expression = qtab
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot"

  // The per-slot null guards run on EVERY (subspace, candidate)
  // iteration — the path the comments above identify as the query
  // hotspot — but they only have work to do when the array TYPE admits
  // nulls. The internally-built inputs never do (adcTables densifies
  // empty cells through coalesce → containsNull=false; codes come from
  // a non-null struct field projection), so the guard is hoisted to a
  // per-EXPRESSION type check and only genuinely nullable caller-built
  // arrays (the public SQL surface) pay the per-element branch.
  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  private lazy val codesNullable = elemNullable(codes)
  private lazy val tabNullable = elemNullable(qtab)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val c = a.asInstanceOf[ArrayData]
    val t = b.asInstanceOf[ArrayData]
    val m = c.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codesNullable) GraftHashOps.checkAdcNotNull(c.isNullAt(s), s)
      val code = c.getInt(s)
      GraftHashOps.checkAdcCode(code, s, ksub, t.numElements())
      val slot = s * ksub + code
      if (tabNullable) GraftHashOps.checkAdcTabNotNull(t.isNullAt(slot), slot)
      acc += t.getDouble(slot)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      val codeGuard = if (codesNullable)
        s"""org.apache.spark.sql.graftx.GraftHashOps.checkAdcNotNull(
           |    $a.isNullAt($s), $s);""".stripMargin
      else "// codes ArrayType is containsNull=false: no per-slot guard"
      val tabGuard = if (tabNullable)
        s"""org.apache.spark.sql.graftx.GraftHashOps.checkAdcTabNotNull(
           |    $b.isNullAt($s * $ksub + $idx), $s * $ksub + $idx);""".stripMargin
      else "// qtab ArrayType is containsNull=false: no per-slot guard"
      s"""
         |int $m = $a.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  $codeGuard
         |  int $idx = $a.getInt($s);
         |  org.apache.spark.sql.graftx.GraftHashOps.checkAdcCode(
         |    $idx, $s, $ksub, $b.numElements());
         |  $tabGuard
         |  $acc += $b.getDouble($s * $ksub + $idx);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, qtab = newRight)
}

object PqEncodeCodes {
  /** Flat driver-built codebook, broadcast to executors: entries
    * grouped by subspace (ascending), cells ascending within a sub,
    * each sub's candidates contiguous in (cellIds, cnn, flat). */
  final class Codebook(val subStart: Array[Int], val cellIds: Array[Int],
                       val cnn: Array[Double], val flat: Array[Double],
                       val dsub: Int)
    extends Serializable
}

/** PQ ENCODE as one map-side expression over a DRIVER-BUILT broadcast
  * codebook: for each of the m subspaces, the nearest cell's code —
  * argmin over cnn − 2·(sv·centroid), the L2 ordering with the ‖sv‖²
  * constant dropped, exactly the relational formulation's scoring.
  *
  * The relational encode (posexplode to n·m subvectors → broadcast
  * join against the codebook → n·m·ksub joined rows → two hash
  * aggregates) was measured as the whole index-build wall at the
  * decade tiers: ~10 s per 200k vectors of per-row machinery for 2k
  * madds of arithmetic. The codebook is model parameters (m·ksub·dsub
  * doubles, tens of KB), so like [[IvfArgMin]] it rides a Spark
  * Broadcast captured by the expression — a pure map-side Project, no
  * explode, no join, no per-row pack copy.
  *
  * Semantics pinned to the old formulation (PqEncodeParitySpec):
  * candidate order is Spark's min(struct(d2, cell)) —
  * SQLOrderingUtil.compareDoubles on d2 (ties −0.0/0.0, NaN largest),
  * lower cell on ties; dot accumulation is index-ordered double adds
  * (the reduce(_ + _) fold). A null vector ELEMENT nulls every
  * candidate's d2 for that subspace, which min(struct) resolved to
  * the lowest cell id — replicated. Deviations, both loud instead of
  * silent: a subspace with NO codebook rows throws at pack-build time
  * (the join used to silently DROP that position, shifting later
  * codes left); a NULL vector yields null codes (the join used to
  * emit lowest-cell codes — a plausible-wrong-results shape).
  */
case class PqEncodeCodes(vec: Expression,
                         cb: org.apache.spark.broadcast.Broadcast[PqEncodeCodes.Codebook],
                         dim: Int, m: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  require(m > 0 && dim % m == 0, s"dim $dim must split into m=$m subspaces")

  override def child: Expression = vec
  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_codes"

  private lazy val vecFloat = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private val dsub = dim / m

  @transient private lazy val pk = cb.value

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    GraftHashOps.checkSameLength(x.numElements(), dim)
    val starts = pk.subStart; val ids = pk.cellIds
    val cnn = pk.cnn; val flat = pk.flat
    val codes = new Array[Int](m)
    val sv = new Array[Double](dsub)
    var s = 0
    while (s < m) {
      val vbase = s * dsub
      var hasNull = false
      var j = 0
      while (j < dsub) {
        if (x.isNullAt(vbase + j)) hasNull = true
        else sv(j) = if (vecFloat) x.getFloat(vbase + j).toDouble
          else x.getDouble(vbase + j)
        j += 1
      }
      val from = starts(s); val until = starts(s + 1)
      if (hasNull) {
        // every candidate's d2 is null; min(struct(null, cell)) is the
        // lowest cell — the codebook is cell-sorted within a sub
        codes(s) = ids(from)
      } else {
        var bestCell = 0
        var bestD2 = 0.0
        var first = true
        var e = from
        while (e < until) {
          val base = e * dsub
          var dot = 0.0
          j = 0
          while (j < dsub) { dot += sv(j) * flat(base + j); j += 1 }
          val d2 = cnn(e) - 2.0 * dot
          val cmp = if (first) -1
            else org.apache.spark.sql.catalyst.util.SQLOrderingUtil
              .compareDoubles(d2, bestD2)
          if (cmp < 0 || (cmp == 0 && ids(e) < bestCell)) {
            bestCell = ids(e); bestD2 = d2
          }
          first = false
          e += 1
        }
        codes(s) = bestCell
      }
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(vec = newChild)
}

/** Static helpers callable from generated Java (Scala objects emit
  * static forwarders), so the hash expressions participate in
  * whole-stage codegen as one method call instead of a CodegenFallback
  * row-materializing eval.
  */
object GraftHashOps {
  /** A NULL code slot would read as code 0 (ArrayData.getInt on a
    * null slot) — a plausible wrong similarity, the exact failure
    * shape these guards exist to prevent (callable from codegen). */
  def checkAdcNotNull(isNull: Boolean, sub: Int): Unit =
    if (isNull) throw new IllegalArgumentException(
      s"pq_adc_dot: null code at subspace $sub — encode emitted an " +
        "incomplete code array")

  /** Loud guard for ADC lookups escaping the per-subspace table band
    * (callable from codegen). A code >= ksub would stay INSIDE the
    * table but read a neighbor subspace's slot — plausible wrong
    * similarities, the worst failure shape — so the code itself is
    * validated, not just the final index. */
  def checkAdcCode(code: Int, sub: Int, ksub: Int, tabLen: Int): Unit =
    if (code < 0 || code >= ksub || sub * ksub + code >= tabLen)
      throw new IllegalArgumentException(
        s"pq_adc_dot: code $code at subspace $sub escapes its [0, $ksub) " +
          s"band (table has $tabLen slots) — codes and codebook disagree on (m, ksub)")

  /** Loud guard for null LOOKUP-TABLE slots (callable from codegen).
    * pq_adc_dot is on the public SQL surface, so a caller-built qtab
    * with a null element (e.g. a map lookup that missed) must throw
    * like a null code does — ArrayData.getDouble would silently unbox
    * it to 0.0, the same plausible-wrong-similarity shape the code
    * guards exist to prevent.
    */
  def checkAdcTabNotNull(isNull: Boolean, slot: Int): Unit =
    if (isNull) throw new IllegalArgumentException(
      s"pq_adc_dot: null lookup-table slot $slot — the per-query ADC " +
        "table must be fully populated (one double per (sub, cell))")

  /** Loud guard for vector-length mismatches (callable from codegen). */
  def checkSameLength(a: Int, b: Int): Unit =
    if (a != b) throw new IllegalArgumentException(
      s"float_vec_dot: vector lengths differ ($a vs $b) — " +
        "upstream embedding corruption, refusing to dot the common prefix")

  def simHash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def minHashSignature(arr: ArrayData, coeffA: Array[Long], coeffB: Array[Long]): ArrayData = {
    val P = 2147483647L
    val k = coeffA.length
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val base = java.lang.Math.floorMod(
        XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L), P)
      var p = 0
      while (p < k) {
        val h = (coeffA(p) * base + coeffB(p)) % P
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Windows containing a NULL token are skipped (the input type
    * admits containsNull arrays; an unguarded getUTF8String would NPE
    * the whole task on one null element).
    */
  def tokenNgrams(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    val res = new scala.collection.mutable.ArrayBuffer[AnyRef](math.max(0, sz - n + 1))
    var i = 0
    while (i <= sz - n) {
      val sb = new java.lang.StringBuilder()
      var ok = true
      var j = 0
      while (ok && j < n) {
        if (arr.isNullAt(i + j)) ok = false
        else {
          if (j > 0) sb.append(' ')
          sb.append(arr.getUTF8String(i + j).toString)
          j += 1
        }
      }
      if (ok) res += UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(res.toArray)
  }

  def rollingHash31(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** All k-codepoint window hashes of a string in ONE O(n) pass
    * (Karp–Rabin): h(i+1) = (h(i) − cp[i]·B^(k−1))·B + cp[i+k], 64-bit
    * wraparound arithmetic, B = 1000003. Array slot j (0-based) is the
    * hash of `substring(s, j+1, k)` under SQL 1-based codepoint
    * positions — exactly the windows `substring` materializes, without
    * the O(n·k) per-position string allocation. Shorter-than-k input →
    * empty array.
    */
  def windowHashes(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < k) return new GenericArrayData(new Array[Long](0))
    val cps = new Array[Int](n)
    var i = 0
    var ci = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(ci) = cp
      ci += 1
      i += Character.charCount(cp)
    }
    val B = 1000003L
    var bk = 1L // B^(k-1), wrapped
    var j = 0
    while (j < k - 1) { bk *= B; j += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    j = 0
    while (j < k) { h = h * B + cps(j); j += 1 }
    out(0) = h
    var p = 1
    while (p <= n - k) {
      h = (h - cps(p - 1) * bk) * B + cps(p + k - 1)
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  def rhpSignature(v: ArrayData, planes: Array[Array[Double]], dim: Int): Long = {
    // a truncated/overlong embedding must fail LOUDLY like
    // float_vec_dot does — a signature computed over a prefix lands
    // corrupt vectors in wrong buckets with no signal
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"rhp_signature: vector length ${v.numElements()} != configured dim $dim")
    val n = dim
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val plane = planes(b)
      var proj = 0.0
      var d = 0
      while (d < n) {
        proj += v.getFloat(d).toDouble * plane(d)
        d += 1
      }
      if (proj >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** 64-bit SimHash of an `array<string>` token column in ONE pass:
  * per-token xxhash64 (seed 42, identical to the builtin), ±1 vote per
  * bit, sign → bit. Replaces 64 interpreted `aggregate` folds over the
  * token array with a single native O(tokens × 64) loop; generates a
  * static call so whole-stage codegen keeps flowing.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.simHash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftx.GraftHashOps.simHash64($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature (k universal-hash permutations) of an
  * `array<string>` shingle column in one pass:
  * base = xxhash64(shingle, 42) mod p, h_i = (a_i·base + b_i) mod p
  * with p = 2^31-1 (Mersenne) and a_i ∈ [1,p), b_i ∈ [0,p) drawn from
  * a fixed splitmix stream. Products stay < 2^62 (no signed-long
  * overflow) AND wrap the modulus many times — a min-wise independent
  * family (coefficients that never wrap would make every slot pick
  * the same minimum element). Returns `array<long>` of length k.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private val P = 2147483647L // 2^31 - 1
  private def mix(i: Long): Long = {
    var z = i * 0x9E3779B97F4A7C15L + 0x632BE59BD9B4E019L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private lazy val coeffA: Array[Long] =
    Array.tabulate(k)(i => java.lang.Math.floorMod(mix(2L * i), P - 1) + 1)
  private lazy val coeffB: Array[Long] =
    Array.tabulate(k)(i => java.lang.Math.floorMod(mix(2L * i + 1), P))

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.minHashSignature(input.asInstanceOf[ArrayData], coeffA, coeffB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refA = ctx.addReferenceObj("coeffA", coeffA, "long[]")
    val refB = ctx.addReferenceObj("coeffB", coeffB, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftx.GraftHashOps.minHashSignature($c, $refA, $refB);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Karp–Rabin window hashes: `array<long>` of every k-codepoint
  * window's rolling hash, one O(n) pass — the candidate-generation
  * primitive for exact-substring dedup. Replaces per-position
  * `xxhash64(substring(text, p, k))` (O(n·k) work + a k-char
  * allocation per position) in [[graft.operators.DedupOps.repeatedSpans]]'s
  * first pass; collisions only ever ADD candidates, which the second
  * (exact-string) pass filters, so the hash family is free to change.
  */
case class WindowHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.windowHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftx.GraftHashOps.windowHashes($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Token n-gram shingles ("w1 w2 w3") of an `array<string>` token
  * column as one native pass (the HOF form builds each shingle through
  * interpreted lambda plumbing). Shorter-than-n input → empty array.
  */
case class TokenNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // n <= 0 would "succeed" with sz+1+|n| empty-string shingles flowing
  // into minhash/Jaccard as if real — the silent-wrong-results class
  // this expression's builder exists to prevent
  require(n >= 1, s"token_ngrams: n must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_ngrams"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.tokenNgrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftx.GraftHashOps.tokenNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling hash of a string column —
  * acc = (acc·31 + codepoint) mod 1e9+7 over Unicode code points, the
  * same left fold as the HOF form (`aggregate` over `split(text,'')`
  * with `ascii`) and DuckDB's `list_reduce` over `unicode(c)`, but one
  * native O(chars) loop instead of an interpreted lambda per
  * character.
  */
case class RollingHash31(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash31"

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.rollingHash31(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftx.GraftHashOps.rollingHash31($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH signature of an `array<float>` vector:
  * nBits sign bits, hyperplane components from a fixed LCG stream in
  * [-1,1] keyed by (bit, dim) — same construction and accumulation
  * order as the Column-expression form, one native O(nBits·dim) loop
  * instead of a 512-term codegen expression tree.
  */
case class RhpSignature(child: Expression, dim: Int, nBits: Int,
                        planeOffset: Int = 0)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_signature"

  // planeOffset shifts into a disjoint stretch of the global plane
  // sequence, so several signature words together behave as one long
  // multi-table signature (bands × bits > 64 across words).
  // Components come from a full-avalanche mix (splitmix64 finalizer) —
  // a single LCG step here left consecutive planes correlated
  // (|cos| ≈ 0.4, with periodic exact repeats), silently collapsing
  // the effective band count and the advertised recall.
  private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nBits, dim) { (b, d) =>
      var z = ((planeOffset + b).toLong * dim + d) * 0x9E3779B97F4A7C15L + 0x1234567L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 53).toDouble * 2 - 1
    }

  override def nullSafeEval(input: Any): Any =
    GraftHashOps.rhpSignature(input.asInstanceOf[ArrayData], planes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftx.GraftHashOps.rhpSignature($c, $planesRef, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column API + SQL registration for the graft expressions. */
/** Custom GENERATOR (the UDTF extension surface, completing the
  * Catalyst taxonomy next to scalar expressions, aggregates, the
  * optimizer rule, and the whole physical operator): emits
  * (pos, ngram) rows DIRECTLY from a token array — one row at a time
  * through `GenerateExec` — without ever materializing the n-gram
  * ARRAY the `explode(token_ngrams(...))` form allocates per row.
  * For a w-token document that array is w·n tokens of transient heap;
  * the generator's working set is one StringBuilder. Positions are
  * 1-based, matching `posexplode`+1 conventions in the oracles.
  *
  * Generators run outside whole-stage codegen by design
  * (CodegenFallback) — the explode form pays the same exec boundary,
  * so this trades only the intermediate allocation.
  */
case class NgramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback
    with ExpectsInputTypes {

  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def prettyName: String = "ngram_gen"

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val a = v.asInstanceOf[ArrayData]
      val m = a.numElements() - n + 1
      if (m <= 0) Iterator.empty
      else (0 until m).iterator
        // a window containing a NULL token is skipped (not NPE'd)
        .filter(i => (0 until n).forall(j => !a.isNullAt(i + j)))
        .zipWithIndex
        .map { case (i, outIdx) =>
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(a.getUTF8String(i + j).toString)
            j += 1
          }
          // SURVIVOR-ordinal position (outIdx+1), not the raw window
          // index: token_ngrams compacts null-bearing windows out of
          // its array, so posexplode(token_ngrams(...))+1 numbers the
          // survivors — the documented equivalence must hold for
          // null-bearing token arrays too
          InternalRow(outIdx + 1, UTF8String.fromString(sb.toString))
        }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftFunctions {
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVecDot(expr(a), expr(b)))

  def numVecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(NumVecDot(expr(a), expr(b)))

  def ivfArgMin(vec: Column,
                cents: org.apache.spark.broadcast.Broadcast[IvfArgMin.Cents]): Column =
    ExpressionUtils.column(IvfArgMin(expr(vec), cents))

  def pqEncodeCodes(vec: Column,
                    cb: org.apache.spark.broadcast.Broadcast[PqEncodeCodes.Codebook],
                    dim: Int, m: Int): Column =
    ExpressionUtils.column(PqEncodeCodes(expr(vec), cb, dim, m))

  def vecNorm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vecDot(a, a))
  }

  def pqAdcDot(codes: Column, qtab: Column, ksub: Int): Column =
    ExpressionUtils.column(PqAdcDot(expr(codes), expr(qtab), ksub))

  def simHash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(expr(tokens)))

  def minHashSignature(shingles: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSignature(expr(shingles), k))

  def tokenNgrams(tokens: Column, n: Int): Column =
    ExpressionUtils.column(TokenNgrams(expr(tokens), n))

  def rhpSignature(vec: Column, dim: Int, nBits: Int,
                   planeOffset: Int = 0): Column =
    ExpressionUtils.column(RhpSignature(expr(vec), dim, nBits, planeOffset))

  def rollingHash31(s: Column): Column =
    ExpressionUtils.column(RollingHash31(expr(s)))

  def windowHashes(s: Column, k: Int): Column =
    ExpressionUtils.column(WindowHashes(expr(s), k))

  /** Generator form of n-gram shingling: SELECT with
    * `ngramGen(tokens, n)` emits (pos, ngram) rows directly. */
  def ngramGen(tokens: Column, n: Int): Column =
    ExpressionUtils.column(NgramGenerator(expr(tokens), n))

  private def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** SQL builder for `pq_adc_dot(codes, qtab, ksub)` — ksub must be a
    * FOLDABLE literal (a runtime ksub could silently disagree with the
    * codes' geometry, the failure the band guard exists to catch).
    * One builder shared by the extension and plain-session registries
    * so the two SQL surfaces cannot drift.
    */
  def pqAdcDotBuilder(es: Seq[Expression]): Expression = es match {
    case Seq(codes, qtab, k) if k.foldable && k.eval() != null =>
      PqAdcDot(codes, qtab, k.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "pq_adc_dot expects (array<int> codes, array<double> qtab, integer literal ksub)")
  }

  /** SQL builder for `token_ngrams(tokens[, n])`: optional FOLDABLE n
    * (default 3). A silently-ignored second argument is worse than an
    * error — `token_ngrams(toks, 2)` returning 3-grams is wrong
    * results with no signal — so wrong arity / non-literal n throw at
    * analysis like the builtins do.
    */
  def tokenNgramsBuilder(es: Seq[Expression]): Expression = es match {
    case Seq(tokens) => TokenNgrams(tokens, 3)
    case Seq(tokens, n) if n.foldable && n.eval() != null =>
      TokenNgrams(tokens, n.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "token_ngrams expects (array<string> tokens[, integer literal n])")
  }

  /** Register as SQL functions (K5/§3.3 surface: usable from
    * `spark.sql`, e.g. `SELECT float_vec_dot(a, b)`).
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("float_vec_dot",
      es => FloatVecDot(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("token_ngrams",
      tokenNgramsBuilder, "built-in")
    reg.createOrReplaceTempFunction("pq_adc_dot", pqAdcDotBuilder, "built-in")
  }
}
