package graft.queries

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.DetRound.{r2, sqlR2}

/** Randomized differential fuzzing of the relational surface — the one
  * correctness axis the 245 hand-written oracle rows cannot cover: the
  * query the builder didn't think of. A seeded generator emits a small
  * query AST (base relation or join, predicate tree, then an
  * aggregate / projection / window shape) and renders it BOTH ways:
  * as DataFrame operations and as SQL in the dialect subset DuckDB and
  * Spark SQL share. Three consumers:
  *
  *   - `QueryFuzzSpec` runs ~100 seeds per build, comparing the
  *     DataFrame rendering against `spark.sql` of the SQL rendering —
  *     pinning that the two renderers mean the same query;
  *   - `FuzzQueries` registers a fixed-seed dozen as oracle-gate rows,
  *     so the DRIVER hash-compares the DataFrame rendering against
  *     DuckDB every round — the true cross-engine differential;
  *   - new seeds cost nothing: any hash mismatch is either an engine
  *     divergence or a renderer bug, both worth finding.
  *
  * Dialect guardrails baked into the renderers (the QueryPack
  * conventions): double aggregates wrapped in the shared
  * floor-round (`DetRound`), integer SUMs cast to BIGINT on both
  * sides, EXTRACT(YEAR …) cast to INT on both sides, every computed
  * column aliased identically, timestamp literals in full
  * `TIMESTAMP 'yyyy-MM-dd HH:mm:ss'` form, numeric literals at ≤2
  * decimals so both parsers bind the identical double.
  */
object QueryFuzz {

  // ---- relation metadata (domains sampled from the test tables) ----
  final case class NumCol(name: String, lo: Double, hi: Double, isInt: Boolean)
  final case class StrCol(name: String, domain: Seq[String])
  final case class TsCol(name: String, yearLo: Int, yearHi: Int)

  final case class Rel(tables: Seq[String], sqlFrom: String,
                       joinKeys: Option[(String, String)], joinType: String,
                       nums: Seq[NumCol], strs: Seq[StrCol], tss: Seq[TsCol])

  private val liNums = Seq(
    NumCol("l_quantity", 1, 50, isInt = false),
    NumCol("l_extendedprice", 900, 105000, isInt = false),
    NumCol("l_discount", 0, 0.1, isInt = false),
    NumCol("l_linenumber", 1, 7, isInt = true))
  private val liStrs = Seq(
    StrCol("l_returnflag", Seq("A", "N", "R")),
    StrCol("l_linestatus", Seq("F", "O")))
  private val liTs = Seq(TsCol("l_shipdate", 1995, 2001))
  private val orNums = Seq(NumCol("o_totalprice", 1300, 500000, isInt = false))
  private val orStrs = Seq(
    StrCol("o_orderstatus", Seq("F", "O", "P")),
    StrCol("o_orderpriority",
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
  private val orTs = Seq(TsCol("o_orderdate", 1995, 2001))
  private val cuNums = Seq(
    NumCol("c_acctbal", -850, 9900, isInt = false),
    NumCol("c_nationkey", 0, 24, isInt = true))
  private val cuStrs = Seq(StrCol("c_mktsegment",
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")))

  private def rels(joinType: String): Seq[Rel] = Seq(
    Rel(Seq("lineitem"), "lineitem", None, "inner", liNums, liStrs, liTs),
    Rel(Seq("orders"), "orders", None, "inner", orNums, orStrs, orTs),
    Rel(Seq("customer"), "customer", None, "inner", cuNums, cuStrs, Nil),
    Rel(Seq("lineitem", "orders"),
      s"lineitem ${joinType.toUpperCase} JOIN orders ON l_orderkey = o_orderkey",
      Some(("l_orderkey", "o_orderkey")), joinType,
      liNums ++ orNums, liStrs ++ orStrs, liTs ++ orTs),
    Rel(Seq("orders", "customer"),
      s"orders ${joinType.toUpperCase} JOIN customer ON o_custkey = c_custkey",
      Some(("o_custkey", "c_custkey")), joinType,
      orNums ++ cuNums, orStrs ++ cuStrs, orTs))

  // ---- AST ----
  sealed trait Pred
  final case class NumCmp(col: String, op: String, v: Double, isInt: Boolean) extends Pred
  final case class NumBetween(col: String, lo: Double, hi: Double, isInt: Boolean) extends Pred
  final case class StrEq(col: String, v: String) extends Pred
  final case class StrIn(col: String, vs: Seq[String]) extends Pred
  final case class TsCmp(col: String, op: String, ts: String) extends Pred
  final case class Bool(a: Pred, or: Boolean, b: Pred) extends Pred

  sealed trait Agg
  case object CountStar extends Agg
  final case class SumNum(col: String, isInt: Boolean) extends Agg
  final case class AvgNum(col: String) extends Agg
  final case class MinNum(col: String) extends Agg
  final case class MaxNum(col: String) extends Agg
  final case class CountDistinct(col: String) extends Agg

  sealed trait Shape
  /** keys: (name, isYearOf — Some(tsCol) for the derived year key). */
  final case class AggShape(keys: Seq[(String, Option[String])], aggs: Seq[Agg]) extends Shape
  final case class ProjectShape(cols: Seq[String],
                                derived: Option[(String, String)], // (price, discount)
                                distinct: Boolean) extends Shape
  /** One window function over a deterministic total order. */
  final case class WindowShape(partCol: String, fn: String, frame: Int) extends Shape

  /** v2 shapes — semi/anti joins, HAVING, set operations. A SEPARATE
    * generator (and gate-seed family) rather than new cases in
    * [[generate]]: the v1 gate rows' rendered queries must stay
    * byte-stable across rounds, and any new branch in a shared
    * generator re-deals every rng draw after it.
    */
  final case class SemiShape(anti: Boolean, rightTable: String,
                             leftKey: String, rightKey: String,
                             rightPred: Option[Pred], cols: Seq[String]) extends Shape
  /** HAVING over the first aggregate (always COUNT(*) — dialect-safe
    * and never null) with a keyed GROUP BY. */
  final case class HavingShape(keys: Seq[(String, Option[String])], aggs: Seq[Agg],
                               minCount: Long) extends Shape
  /** Two predicate branches over the same relation/projection glued by
    * a set op ∈ {UNION ALL, INTERSECT, EXCEPT}. */
  final case class SetOpShape(op: String, cols: Seq[String],
                              predA: Pred, predB: Pred) extends Shape

  /** v3 shapes — the layers v1/v2 never probe: the scalar EXPRESSION
    * evaluator (arith / CASE / COALESCE / string / date trees, with
    * NULLIF-injected nulls so three-valued logic is actually
    * exercised), ORDER BY + LIMIT over a deterministic total order
    * (TakeOrderedAndProject vs DuckDB's sort — with explicit NULLS
    * placement, where the engines' defaults differ), and ROLLUP
    * grouping analytics. Own generator + seed family (`qf3_gen_*`)
    * for the same byte-stability reason as v2.
    */
  sealed trait NExpr
  final case class NCol(name: String) extends NExpr
  final case class NLit(v: Double) extends NExpr
  final case class NBin(op: String, a: NExpr, b: NExpr) extends NExpr
  final case class NIf(p: Pred, t: NExpr, f: NExpr) extends NExpr
  /** NULLIF over an INT-domain column with v drawn from the domain —
    * guarantees real nulls flow into the parent tree. */
  final case class NNullIf(c: String, v: Double) extends NExpr
  final case class NCoal(a: NExpr, b: NExpr) extends NExpr
  final case class NLen(s: SExpr) extends NExpr

  sealed trait SExpr
  final case class SCol(name: String) extends SExpr
  final case class SLit(v: String) extends SExpr
  final case class SFn(fn: String, a: SExpr) extends SExpr // upper | lower
  final case class SSub(a: SExpr, start: Int, len: Int) extends SExpr
  final case class SCat(a: SExpr, b: SExpr) extends SExpr // NULL-propagating: SQL ||, DF concat
  final case class SNullIf(c: String, v: String) extends SExpr
  final case class SCoal(a: SExpr, b: SExpr) extends SExpr
  final case class SIf(p: Pred, t: SExpr, f: SExpr) extends SExpr

  sealed trait DExpr
  final case class DPart(part: String, c: String) extends DExpr // EXTRACT → INT
  final case class DTruncM(c: String) extends DExpr             // first-of-month DATE
  final case class DAddDays(c: String, n: Int) extends DExpr    // DATE + n

  /** Projection of generated scalar expression trees over key columns
    * (always predicated: bounded output at every sf). */
  final case class ExprShape(keys: Seq[String], nums: Seq[NExpr],
                             strs: Seq[SExpr], dates: Seq[DExpr]) extends Shape
  /** ORDER BY a generated numeric expression (explicit NULLS LAST —
    * the engines' ASC defaults differ) + unique tie-break + LIMIT. */
  final case class OrderLimitShape(cols: Seq[String], sortExpr: NExpr,
                                   desc: Boolean, tieBreak: Seq[String],
                                   limit: Int) extends Shape
  /** GROUP BY ROLLUP — the grouping-analytics twin of v1's AggShape
    * (NULLS FIRST ordering on both sides, the a9 convention). */
  final case class RollupShape(keys: Seq[(String, Option[String])],
                               aggs: Seq[Agg]) extends Shape

  final case class FuzzQuery(seed: Long, rel: Rel, pred: Option[Pred], shape: Shape)

  // ---- generation ----
  private def lit2(rng: Random, lo: Double, hi: Double): Double =
    math.floor((lo + rng.nextDouble() * (hi - lo)) * 100) / 100

  private def genPredLeaf(rng: Random, rel: Rel): Pred = {
    val kinds = Seq.newBuilder[Int]
    if (rel.nums.nonEmpty) { kinds += 0; kinds += 1 }
    if (rel.strs.nonEmpty) { kinds += 2; kinds += 3 }
    if (rel.tss.nonEmpty) kinds += 4
    val ks = kinds.result()
    ks(rng.nextInt(ks.size)) match {
      case 0 =>
        val c = rel.nums(rng.nextInt(rel.nums.size))
        val op = Seq("<", ">=", "<=", ">")(rng.nextInt(4))
        val v = lit2(rng, c.lo, c.hi)
        NumCmp(c.name, op, if (c.isInt) math.floor(v) else v, c.isInt)
      case 1 =>
        val c = rel.nums(rng.nextInt(rel.nums.size))
        val a = lit2(rng, c.lo, c.hi); val b = lit2(rng, c.lo, c.hi)
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        NumBetween(c.name, if (c.isInt) math.floor(lo) else lo,
          if (c.isInt) math.floor(hi) else hi, c.isInt)
      case 2 =>
        val c = rel.strs(rng.nextInt(rel.strs.size))
        StrEq(c.name, c.domain(rng.nextInt(c.domain.size)))
      case 3 =>
        val c = rel.strs(rng.nextInt(rel.strs.size))
        val k = 1 + rng.nextInt(math.min(3, c.domain.size))
        StrIn(c.name, rng.shuffle(c.domain).take(k).sorted)
      case _ =>
        val c = rel.tss(rng.nextInt(rel.tss.size))
        val y = c.yearLo + rng.nextInt(c.yearHi - c.yearLo + 1)
        val mo = 1 + rng.nextInt(12); val d = 1 + rng.nextInt(28)
        TsCmp(c.name, Seq("<", ">=")(rng.nextInt(2)),
          f"$y%04d-$mo%02d-$d%02d 00:00:00")
    }
  }

  private def genPred(rng: Random, rel: Rel): Option[Pred] =
    rng.nextInt(4) match {
      case 0 => None
      case 1 | 2 => Some(genPredLeaf(rng, rel))
      case _ => Some(Bool(genPredLeaf(rng, rel), rng.nextBoolean(), genPredLeaf(rng, rel)))
    }

  def generate(seed: Long): FuzzQuery = {
    val rng = new Random(seed)
    val joinType = if (rng.nextBoolean()) "inner" else "left"
    val rs = rels(joinType)
    val rel = rs(rng.nextInt(rs.size))
    val pred = genPred(rng, rel)
    val shape = rng.nextInt(10) match {
      case n if n < 6 => // aggregate
        val keyPool: Seq[(String, Option[String])] =
          rel.strs.map(s => (s.name, None)) ++
            rel.nums.filter(_.isInt).map(c => (c.name, None)) ++
            rel.tss.take(1).map(t => (s"k_year", Some(t.name)))
        val keys = rng.shuffle(keyPool).take(rng.nextInt(3))
        val aggPool: Seq[Agg] = {
          val b = Seq.newBuilder[Agg]
          b += CountStar
          rel.nums.foreach { c =>
            b += SumNum(c.name, c.isInt); b += AvgNum(c.name)
            b += MinNum(c.name); b += MaxNum(c.name)
          }
          rel.strs.foreach(s => b += CountDistinct(s.name))
          b.result()
        }
        val nAgg = 1 + rng.nextInt(3)
        AggShape(keys, rng.shuffle(aggPool).take(nAgg))
      case n if n < 9 => // projection (always filtered: bounded output)
        val pool = rel.nums.map(_.name) ++ rel.strs.map(_.name)
        val cols = rng.shuffle(pool).take(2 + rng.nextInt(3))
        val derived = if (rel.tables.contains("lineitem") && rng.nextBoolean())
          Some(("l_extendedprice", "l_discount")) else None
        ProjectShape(cols, derived, distinct = rng.nextInt(3) == 0)
      case _ => // window over lineitem's unique (orderkey, linenumber) order
        WindowShape(liStrs(rng.nextInt(liStrs.size)).name,
          Seq("row_number", "sum_frame")(rng.nextInt(2)), 1 + rng.nextInt(5))
    }
    // the window shape is lineitem-specific
    val relFixed = shape match {
      case _: WindowShape => rs.head
      case _ => rel
    }
    FuzzQuery(seed, relFixed, if (shape.isInstanceOf[WindowShape]) genPred(rng, rs.head) else pred, shape)
  }

  /** v2 generator: semi/anti joins (EXISTS / NOT EXISTS), HAVING, and
    * set operations — the relational corners v1 leaves dark. Own seed
    * space (gate rows `qf2_gen_*`); never touches [[generate]]'s rng
    * stream, so the v1 gate rows stay byte-stable.
    */
  def generateV2(seed: Long): FuzzQuery = {
    val rng = new Random(seed)
    // java.util.Random's FIRST bounded draw is heavily biased for
    // sequential seeds (the LCG scrambler barely moves the top bits on
    // one step — measured: seeds 1..60 all landed in {1,2} of 4).
    // Two discarded nextLong()s advance the LCG far enough to decouple
    // the shape choice from the raw seed. v1 dodged this by accident
    // (its first draws feed joinType/relation, not the shape).
    rng.nextLong(); rng.nextLong()
    val rs = rels("inner")
    rng.nextInt(4) match {
      case 0 => // semi/anti join, rendered EXISTS / NOT EXISTS in SQL
        val anti = rng.nextBoolean()
        // (left, right, lk, rk): customer⋉orders is the one pair whose
        // ANTI side is naturally non-empty (customers with no orders)
        val (leftRel, rightRel, lk, rk) = rng.nextInt(3) match {
          case 0 => (rs.head, rs(1), "l_orderkey", "o_orderkey")
          case 1 => (rs(1), rs(2), "o_custkey", "c_custkey")
          case _ => (rs(2), rs(1), "c_custkey", "o_custkey")
        }
        val rightPred = if (rng.nextBoolean()) Some(genPredLeaf(rng, rightRel)) else None
        val pool = leftRel.nums.map(_.name) ++ leftRel.strs.map(_.name)
        val cols = rng.shuffle(pool).take(2 + rng.nextInt(2))
        // left side always filtered: bounded output at every sf
        FuzzQuery(seed, leftRel, Some(genPredLeaf(rng, leftRel)),
          SemiShape(anti, rightRel.tables.head, lk, rk, rightPred, cols))
      case 1 | 2 => // keyed aggregate + HAVING on count(*)
        val rel = rs(rng.nextInt(rs.size))
        val keyPool: Seq[(String, Option[String])] =
          rel.strs.map(s => (s.name, None)) ++
            rel.nums.filter(_.isInt).map(c => (c.name, None)) ++
            rel.tss.take(1).map(t => ("k_year", Some(t.name)))
        val keys = rng.shuffle(keyPool).take(1 + rng.nextInt(2))
        val aggPool: Seq[Agg] = rel.nums.flatMap(c =>
          Seq(SumNum(c.name, c.isInt), AvgNum(c.name), MinNum(c.name), MaxNum(c.name)))
        FuzzQuery(seed, rel, genPred(rng, rel),
          HavingShape(keys, rng.shuffle(aggPool).take(1 + rng.nextInt(2)),
            minCount = 1 + rng.nextInt(20)))
      case _ => // set op over two predicate branches of one relation
        val rel = rs(rng.nextInt(rs.size))
        val op = Seq("UNION ALL", "INTERSECT", "EXCEPT")(rng.nextInt(3))
        val pool = rel.nums.map(_.name) ++ rel.strs.map(_.name)
        val cols = rng.shuffle(pool).take(2 + rng.nextInt(2))
        FuzzQuery(seed, rel, None,
          SetOpShape(op, cols, genPredLeaf(rng, rel), genPredLeaf(rng, rel)))
    }
  }

  // ---- v3 generation: expression trees / order-limit / rollup ----
  /** Unique total-order key of each relation (join relations inherit
    * the fact side's key: each fact row matches ≤1 dim row). */
  private def tieBreakKeys(rel: Rel): Seq[String] =
    if (rel.tables.contains("lineitem")) Seq("l_orderkey", "l_linenumber")
    else if (rel.tables.contains("orders")) Seq("o_orderkey")
    else Seq("c_custkey")

  private def genNum(rng: Random, rel: Rel, depth: Int): NExpr = {
    val intCols = rel.nums.filter(_.isInt)
    if (depth <= 0) rng.nextInt(4) match {
      case 0 => NLit(lit2(rng, -10, 10))
      case 1 if intCols.nonEmpty =>
        // NULLIF over an int-domain column at an in-domain value:
        // guaranteed real nulls feeding the parent's 3-valued logic
        val c = intCols(rng.nextInt(intCols.size))
        NNullIf(c.name, math.floor(lit2(rng, c.lo, c.hi)))
      case _ =>
        NCol(rel.nums(rng.nextInt(rel.nums.size)).name)
    } else rng.nextInt(6) match {
      case 0 | 1 =>
        NBin(Seq("+", "-", "*")(rng.nextInt(3)),
          genNum(rng, rel, depth - 1), genNum(rng, rel, depth - 1))
      case 2 => NIf(genPredLeaf(rng, rel),
        genNum(rng, rel, depth - 1), genNum(rng, rel, depth - 1))
      case 3 => NCoal(genNum(rng, rel, depth - 1), genNum(rng, rel, depth - 1))
      case 4 if rel.strs.nonEmpty => NLen(genStr(rng, rel, 1))
      case _ => genNum(rng, rel, depth - 1)
    }
  }

  private def genStr(rng: Random, rel: Rel, depth: Int): SExpr = {
    val sc = rel.strs(rng.nextInt(rel.strs.size))
    if (depth <= 0) rng.nextInt(4) match {
      case 0 => SLit(sc.domain(rng.nextInt(sc.domain.size)))
      case 1 => SNullIf(sc.name, sc.domain(rng.nextInt(sc.domain.size)))
      case _ => SCol(sc.name)
    } else rng.nextInt(6) match {
      case 0 => SFn(Seq("upper", "lower")(rng.nextInt(2)), genStr(rng, rel, depth - 1))
      case 1 => SSub(genStr(rng, rel, depth - 1), 1 + rng.nextInt(3), 1 + rng.nextInt(4))
      case 2 => SCat(genStr(rng, rel, depth - 1), genStr(rng, rel, depth - 1))
      case 3 => SCoal(genStr(rng, rel, depth - 1), genStr(rng, rel, depth - 1))
      case 4 => SIf(genPredLeaf(rng, rel),
        genStr(rng, rel, depth - 1), genStr(rng, rel, depth - 1))
      case _ => genStr(rng, rel, depth - 1)
    }
  }

  private def genDate(rng: Random, rel: Rel): DExpr = {
    val c = rel.tss(rng.nextInt(rel.tss.size)).name
    rng.nextInt(5) match {
      case 0 => DPart("YEAR", c)
      case 1 => DPart("MONTH", c)
      case 2 => DPart("DAY", c)
      case 3 => DTruncM(c)
      case _ => DAddDays(c, 1 + rng.nextInt(30))
    }
  }

  /** v3 generator — see the shape scaladoc. Same discarded-draw
    * preamble as v2 (java.util.Random's first bounded draw is biased
    * for sequential seeds). */
  def generateV3(seed: Long): FuzzQuery = {
    val rng = new Random(seed)
    rng.nextLong(); rng.nextLong()
    val rs = rels(if (rng.nextBoolean()) "inner" else "left")
    rng.nextInt(10) match {
      case n if n < 5 => // expression-tree projection
        val rel = rs(rng.nextInt(rs.size))
        val nums = Seq.fill(1 + rng.nextInt(2))(genNum(rng, rel, 2))
        val strs = if (rel.strs.nonEmpty && rng.nextBoolean())
          Seq(genStr(rng, rel, 2)) else Nil
        val dates = if (rel.tss.nonEmpty && rng.nextBoolean())
          Seq(genDate(rng, rel)) else Nil
        FuzzQuery(seed, rel, Some(genPredLeaf(rng, rel)),
          ExprShape(tieBreakKeys(rel), nums, strs, dates))
      case n if n < 8 => // order by expression + limit
        val rel = rs(rng.nextInt(rs.size))
        val pool = rel.nums.map(_.name) ++ rel.strs.map(_.name)
        val cols = rng.shuffle(pool).take(2 + rng.nextInt(2))
        FuzzQuery(seed, rel, genPred(rng, rel),
          OrderLimitShape(cols, genNum(rng, rel, 2), rng.nextBoolean(),
            tieBreakKeys(rel), 5 + rng.nextInt(46)))
      case _ => // rollup
        val rel = rs(rng.nextInt(rs.size))
        val keyPool: Seq[(String, Option[String])] =
          rel.strs.map(s => (s.name, None)) ++
            rel.nums.filter(_.isInt).map(c => (c.name, None)) ++
            rel.tss.take(1).map(t => ("k_year", Some(t.name)))
        val keys = rng.shuffle(keyPool).take(1 + rng.nextInt(2))
        val aggPool: Seq[Agg] = {
          val b = Seq.newBuilder[Agg]
          b += CountStar
          rel.nums.foreach { c =>
            b += SumNum(c.name, c.isInt); b += AvgNum(c.name)
            b += MinNum(c.name); b += MaxNum(c.name)
          }
          b.result()
        }
        FuzzQuery(seed, rel, genPred(rng, rel),
          RollupShape(keys, rng.shuffle(aggPool).take(1 + rng.nextInt(2))))
    }
  }

  // ---- SQL rendering (shared DuckDB/Spark dialect) ----
  private def numLit(v: Double, isInt: Boolean): String =
    if (isInt) v.toLong.toString
    else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  private def sqlPred(p: Pred): String = p match {
    case NumCmp(c, op, v, i) => s"$c $op ${numLit(v, i)}"
    case NumBetween(c, lo, hi, i) => s"$c BETWEEN ${numLit(lo, i)} AND ${numLit(hi, i)}"
    case StrEq(c, v) => s"$c = '$v'"
    case StrIn(c, vs) => s"$c IN (${vs.map(v => s"'$v'").mkString(", ")})"
    case TsCmp(c, op, ts) => s"$c $op TIMESTAMP '$ts'"
    case Bool(a, or, b) => s"(${sqlPred(a)}) ${if (or) "OR" else "AND"} (${sqlPred(b)})"
  }

  private def sqlAgg(a: Agg, i: Int): String = a match {
    case CountStar => s"CAST(count(*) AS BIGINT) AS a$i"
    case SumNum(c, true) => s"CAST(sum($c) AS BIGINT) AS a$i"
    case SumNum(c, false) => s"${sqlR2(s"sum($c)")} AS a$i"
    case AvgNum(c) => s"${sqlR2(s"avg($c)")} AS a$i"
    case MinNum(c) => s"min($c) AS a$i"
    case MaxNum(c) => s"max($c) AS a$i"
    case CountDistinct(c) => s"CAST(count(DISTINCT $c) AS BIGINT) AS a$i"
  }

  private def sqlNum(e: NExpr): String = e match {
    case NCol(c) => s"CAST($c AS DOUBLE)"
    // literals carry an explicit DOUBLE cast: bare `0.71` parses as
    // DECIMAL(2,2) in BOTH SQL engines, and with no DetRound wrap in
    // the v3 output (see ExprShape) a decimal-typed subtree surfaces
    // exact-decimal arithmetic (0.71 * -3.94 = -2.7974) where the
    // DataFrame side's lit(0.71) is IEEE double (-2.7973999…)
    case NLit(v) => s"CAST(${numLit(v, isInt = false)} AS DOUBLE)"
    case NBin(op, a, b) => s"(${sqlNum(a)} $op ${sqlNum(b)})"
    case NIf(p, t, f) =>
      s"CASE WHEN ${sqlPred(p)} THEN ${sqlNum(t)} ELSE ${sqlNum(f)} END"
    case NNullIf(c, v) =>
      s"NULLIF(CAST($c AS DOUBLE), CAST(${numLit(v, isInt = false)} AS DOUBLE))"
    case NCoal(a, b) => s"COALESCE(${sqlNum(a)}, ${sqlNum(b)})"
    case NLen(s) => s"CAST(length(${sqlStr(s)}) AS DOUBLE)"
  }

  private def sqlStr(e: SExpr): String = e match {
    case SCol(c) => c
    case SLit(v) => s"'$v'"
    case SFn(fn, a) => s"$fn(${sqlStr(a)})"
    case SSub(a, st, ln) => s"substr(${sqlStr(a)}, $st, $ln)"
    // `||`, not concat(): DuckDB's concat() SKIPS nulls while Spark's
    // propagates them — `||` null-propagates on both engines
    case SCat(a, b) => s"(${sqlStr(a)} || ${sqlStr(b)})"
    case SNullIf(c, v) => s"NULLIF($c, '$v')"
    case SCoal(a, b) => s"COALESCE(${sqlStr(a)}, ${sqlStr(b)})"
    case SIf(p, t, f) =>
      s"CASE WHEN ${sqlPred(p)} THEN ${sqlStr(t)} ELSE ${sqlStr(f)} END"
  }

  private def sqlDate(e: DExpr): String = e match {
    case DPart(p, c) => s"CAST(EXTRACT($p FROM $c) AS INT)"
    case DTruncM(c) => s"CAST(date_trunc('month', $c) AS DATE)"
    case DAddDays(c, n) => s"(CAST($c AS DATE) + $n)"
  }

  def toSql(q: FuzzQuery): String = {
    val where = q.pred.map(p => s"\nWHERE ${sqlPred(p)}").getOrElse("")
    q.shape match {
      case AggShape(keys, aggs) =>
        val keyExprs = keys.map {
          case (k, None) => k
          case (k, Some(ts)) => s"CAST(EXTRACT(YEAR FROM $ts) AS INT) AS $k"
        }
        val sel = (keyExprs ++ aggs.zipWithIndex.map { case (a, i) => sqlAgg(a, i) })
          .mkString(",\n  ")
        val grp = if (keys.isEmpty) ""
          else s"\nGROUP BY ${keys.indices.map(_ + 1).mkString(", ")}"
        val ord = if (keys.isEmpty) "" else s"\nORDER BY ${keys.map(_._1).mkString(", ")}"
        s"SELECT $sel\nFROM ${q.rel.sqlFrom}$where$grp$ord"
      case ProjectShape(cols, derived, distinct) =>
        val d = derived.map { case (p, disc) =>
          s", ${sqlR2(s"$p * (1 - $disc)")} AS d0" }.getOrElse("")
        val dk = if (distinct) "DISTINCT " else ""
        s"SELECT $dk${cols.mkString(", ")}$d\nFROM ${q.rel.sqlFrom}$where"
      case WindowShape(part, fn, frame) =>
        // l_quantity joins the order: the synthetic lineitem has ~14k
        // duplicate (l_orderkey, l_linenumber) pairs (unlike real
        // TPC-H), and a framed SUM over a non-total order is
        // tie-dependent — engines resolve ties differently, so 5 of
        // 100 sweep seeds diverged cross-engine (value-level FuzzSweep,
        // r13) while the in-process Spark-vs-Spark sweep structurally
        // cannot see it. With the summed column IN the order, rows
        // still tied are interchangeable for both row_number (their
        // output tuples are identical) and the framed sum (equal
        // quantity either way) — the output multiset is deterministic.
        val over = s"PARTITION BY $part ORDER BY l_orderkey, l_linenumber, l_quantity"
        val w = fn match {
          case "row_number" => s"CAST(row_number() OVER ($over) AS BIGINT) AS a0"
          case _ => sqlR2(s"sum(l_quantity) OVER ($over " +
            s"ROWS BETWEEN $frame PRECEDING AND CURRENT ROW)") + " AS a0"
        }
        s"SELECT l_orderkey, l_linenumber, $part, $w\nFROM lineitem$where"
      case SemiShape(anti, rightTable, lk, rk, rightPred, cols) =>
        val ex = if (anti) "NOT EXISTS" else "EXISTS"
        val rp = rightPred.map(p => s" AND (${sqlPred(p)})").getOrElse("")
        val exists =
          s"$ex (SELECT 1 FROM $rightTable WHERE $rk = ${q.rel.sqlFrom}.$lk$rp)"
        val lp = q.pred.map(p => s"(${sqlPred(p)}) AND ").getOrElse("")
        s"SELECT ${cols.mkString(", ")}\nFROM ${q.rel.sqlFrom}\nWHERE $lp$exists"
      case HavingShape(keys, aggs, minCount) =>
        val keyExprs = keys.map {
          case (k, None) => k
          case (k, Some(ts)) => s"CAST(EXTRACT(YEAR FROM $ts) AS INT) AS $k"
        }
        val all = CountStar +: aggs
        val sel = (keyExprs ++ all.zipWithIndex.map { case (a, i) => sqlAgg(a, i) })
          .mkString(",\n  ")
        s"SELECT $sel\nFROM ${q.rel.sqlFrom}$where" +
          s"\nGROUP BY ${keys.indices.map(_ + 1).mkString(", ")}" +
          s"\nHAVING count(*) >= $minCount" +
          s"\nORDER BY ${keys.map(_._1).mkString(", ")}"
      case SetOpShape(op, cols, predA, predB) =>
        val sel = s"SELECT ${cols.mkString(", ")}\nFROM ${q.rel.sqlFrom}"
        s"$sel\nWHERE ${sqlPred(predA)}\n$op\n$sel\nWHERE ${sqlPred(predB)}"
      case ExprShape(keys, nums, strs, dates) =>
        // NO DetRound wrap: per-row expression trees run the identical
        // IEEE ops on both engines, so the raw doubles are bit-equal —
        // and the floor-round is itself the portability hazard here:
        // Spark's floor returns LONG and CLAMPS at Long.MaxValue, so a
        // generated product with |x·100| > 2^63 diverged from DuckDB's
        // double floor (sweep seed v3_075, r13)
        val sel = keys ++
          nums.zipWithIndex.map { case (e, i) => s"${sqlNum(e)} AS e$i" } ++
          strs.zipWithIndex.map { case (e, i) => s"${sqlStr(e)} AS s$i" } ++
          dates.zipWithIndex.map { case (e, i) => s"${sqlDate(e)} AS d$i" }
        s"SELECT ${sel.mkString(",\n  ")}\nFROM ${q.rel.sqlFrom}$where"
      case OrderLimitShape(cols, sortExpr, desc, tie, limit) =>
        val sel = (cols ++ tie).distinct
        val dir = if (desc) "DESC" else "ASC"
        // explicit NULLS LAST: the engines' ASC defaults differ
        // (Spark NULLS FIRST, DuckDB NULLS LAST). The order lists
        // EVERY output column (not just the nominal unique key — the
        // synthetic lineitem has duplicate keys): rows still tied are
        // then full-duplicate OUTPUT rows, so whichever side of the
        // LIMIT boundary either engine keeps, the result multiset is
        // identical. e0 carries no DetRound (see ExprShape).
        s"SELECT ${sel.mkString(", ")}, ${sqlNum(sortExpr)} AS e0" +
          s"\nFROM ${q.rel.sqlFrom}$where" +
          s"\nORDER BY e0 $dir NULLS LAST, ${sel.mkString(", ")}" +
          s"\nLIMIT $limit"
      case RollupShape(keys, aggs) =>
        val keyExprs = keys.map {
          case (k, None) => k
          case (k, Some(ts)) => s"CAST(EXTRACT(YEAR FROM $ts) AS INT) AS $k"
        }
        val sel = (keyExprs ++ aggs.zipWithIndex.map { case (a, i) => sqlAgg(a, i) })
          .mkString(",\n  ")
        s"SELECT $sel\nFROM ${q.rel.sqlFrom}$where" +
          s"\nGROUP BY ROLLUP(${keys.indices.map(_ + 1).mkString(", ")})" +
          s"\nORDER BY ${keys.map(k => s"${k._1} NULLS FIRST").mkString(", ")}"
    }
  }

  // ---- DataFrame rendering ----
  private def dfPred(p: Pred): Column = p match {
    case NumCmp(c, "<", v, _) => col(c) < lit(v)
    case NumCmp(c, "<=", v, _) => col(c) <= lit(v)
    case NumCmp(c, ">", v, _) => col(c) > lit(v)
    case NumCmp(c, _, v, _) => col(c) >= lit(v)
    case NumBetween(c, lo, hi, _) => col(c).between(lit(lo), lit(hi))
    case StrEq(c, v) => col(c) === lit(v)
    case StrIn(c, vs) => col(c).isin(vs: _*)
    case TsCmp(c, "<", ts) => col(c) < lit(java.sql.Timestamp.valueOf(ts))
    case TsCmp(c, _, ts) => col(c) >= lit(java.sql.Timestamp.valueOf(ts))
    case Bool(a, true, b) => dfPred(a) || dfPred(b)
    case Bool(a, false, b) => dfPred(a) && dfPred(b)
  }

  private def dfAgg(a: Agg, i: Int): Column = a match {
    case CountStar => count(lit(1)).cast("long").as(s"a$i")
    case SumNum(c, true) => sum(col(c)).cast("long").as(s"a$i")
    case SumNum(c, false) => r2(sum(col(c))).as(s"a$i")
    case AvgNum(c) => r2(avg(col(c))).as(s"a$i")
    case MinNum(c) => min(col(c)).as(s"a$i")
    case MaxNum(c) => max(col(c)).as(s"a$i")
    case CountDistinct(c) => countDistinct(col(c)).cast("long").as(s"a$i")
  }

  private def dfNum(e: NExpr): Column = e match {
    case NCol(c) => col(c).cast("double")
    case NLit(v) => lit(v)
    case NBin("+", a, b) => dfNum(a) + dfNum(b)
    case NBin("-", a, b) => dfNum(a) - dfNum(b)
    case NBin(_, a, b) => dfNum(a) * dfNum(b)
    case NIf(p, t, f) => when(dfPred(p), dfNum(t)).otherwise(dfNum(f))
    case NNullIf(c, v) =>
      val cc = col(c).cast("double")
      when(cc === lit(v), lit(null).cast("double")).otherwise(cc)
    case NCoal(a, b) => coalesce(dfNum(a), dfNum(b))
    case NLen(s) => length(dfStr(s)).cast("double")
  }

  private def dfStr(e: SExpr): Column = e match {
    case SCol(c) => col(c)
    case SLit(v) => lit(v)
    case SFn("upper", a) => upper(dfStr(a))
    case SFn(_, a) => lower(dfStr(a))
    case SSub(a, st, ln) => substring(dfStr(a), st, ln)
    case SCat(a, b) => concat(dfStr(a), dfStr(b))
    case SNullIf(c, v) =>
      when(col(c) === lit(v), lit(null).cast("string")).otherwise(col(c))
    case SCoal(a, b) => coalesce(dfStr(a), dfStr(b))
    case SIf(p, t, f) => when(dfPred(p), dfStr(t)).otherwise(dfStr(f))
  }

  private def dfDate(e: DExpr): Column = e match {
    case DPart("YEAR", c) => year(col(c)).cast("int")
    case DPart("MONTH", c) => month(col(c)).cast("int")
    case DPart(_, c) => dayofmonth(col(c)).cast("int")
    case DTruncM(c) => trunc(col(c).cast("date"), "month")
    case DAddDays(c, n) => date_add(col(c).cast("date"), n)
  }

  def toDataFrame(q: FuzzQuery, s: SparkSession, dir: String): DataFrame = {
    val base0 = q.rel.tables.map(t => graft.Tables.load(s, dir, t)) match {
      case Seq(one) => one
      case Seq(l, r) =>
        val (lk, rk) = q.rel.joinKeys.get
        l.join(r, l(lk) === r(rk), q.rel.joinType)
    }
    val base = q.pred.map(p => base0.filter(dfPred(p))).getOrElse(base0)
    q.shape match {
      case AggShape(keys, aggs) =>
        val keyCols = keys.map {
          case (k, None) => col(k)
          case (k, Some(ts)) => year(col(ts)).cast("int").as(k)
        }
        val aggCols = aggs.zipWithIndex.map { case (a, i) => dfAgg(a, i) }
        val g = base.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
        if (keys.isEmpty) g else g.orderBy(keys.map(k => col(k._1)): _*)
      case ProjectShape(cols, derived, distinct) =>
        val d = derived.map { case (p, disc) =>
          r2(col(p) * (lit(1) - col(disc))).as("d0") }.toSeq
        val proj = base.select(cols.map(col) ++ d: _*)
        if (distinct) proj.distinct() else proj
      case WindowShape(part, fn, frame) =>
        import org.apache.spark.sql.expressions.Window
        // mirror of the SQL rendering: l_quantity in the order makes
        // the framed sum tie-invariant under duplicate keys
        val order = Window.partitionBy(part)
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val w = fn match {
          case "row_number" => row_number().over(order).cast("long").as("a0")
          case _ => r2(sum(col("l_quantity"))
            .over(order.rowsBetween(-frame, Window.currentRow))).as("a0")
        }
        base.select(col("l_orderkey"), col("l_linenumber"), col(part), w)
      case SemiShape(anti, rightTable, lk, rk, rightPred, cols) =>
        val right0 = graft.Tables.load(s, dir, rightTable)
        val right = rightPred.map(p => right0.filter(dfPred(p))).getOrElse(right0)
        base.join(right, base(lk) === right(rk),
            if (anti) "left_anti" else "left_semi")
          .select(cols.map(col): _*)
      case HavingShape(keys, aggs, minCount) =>
        val keyCols = keys.map {
          case (k, None) => col(k)
          case (k, Some(ts)) => year(col(ts)).cast("int").as(k)
        }
        val aggCols = (CountStar +: aggs).zipWithIndex.map { case (a, i) => dfAgg(a, i) }
        base.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
          .filter(col("a0") >= minCount)
          .orderBy(keys.map(k => col(k._1)): _*)
      case SetOpShape(op, cols, predA, predB) =>
        val a = base.filter(dfPred(predA)).select(cols.map(col): _*)
        val b = base.filter(dfPred(predB)).select(cols.map(col): _*)
        op match {
          case "UNION ALL" => a.unionByName(b)
          case "INTERSECT" => a.intersect(b)
          case _ => a.except(b)
        }
      case ExprShape(keys, nums, strs, dates) =>
        // raw doubles, no DetRound — see the SQL rendering's comment
        val sel = keys.map(col) ++
          nums.zipWithIndex.map { case (e, i) => dfNum(e).as(s"e$i") } ++
          strs.zipWithIndex.map { case (e, i) => dfStr(e).as(s"s$i") } ++
          dates.zipWithIndex.map { case (e, i) => dfDate(e).as(s"d$i") }
        base.select(sel: _*)
      case OrderLimitShape(cols, sortExpr, desc, tie, limit) =>
        // order by every output column — see the SQL rendering's comment
        val selNames = (cols ++ tie).distinct
        val sel = selNames.map(col) :+ dfNum(sortExpr).as("e0")
        val ord = (if (desc) col("e0").desc_nulls_last
                   else col("e0").asc_nulls_last) +: selNames.map(col)
        base.select(sel: _*).orderBy(ord: _*).limit(limit)
      case RollupShape(keys, aggs) =>
        val keyCols = keys.map {
          case (k, None) => col(k)
          case (k, Some(ts)) => year(col(ts)).cast("int").as(k)
        }
        val aggCols = aggs.zipWithIndex.map { case (a, i) => dfAgg(a, i) }
        base.rollup(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
          .orderBy(keys.map(k => col(k._1).asc_nulls_first): _*)
    }
  }
}

/** Fixed-seed fuzz rows in the oracle gate: the driver hash-compares
  * the DataFrame rendering against DuckDB running the SQL rendering —
  * the true cross-engine differential, re-run every round. Seeds are
  * arbitrary but FIXED (hash inputs must be stable across rounds);
  * `QueryFuzzSpec` sweeps a 100-seed superset in-process each build.
  */
object FuzzQueries extends QueryPack {
  private val gateSeeds: Seq[Long] = Seq(3, 7, 11, 19, 23, 31, 42, 57, 64, 71, 88, 95)
  for (seed <- gateSeeds) {
    val fq = QueryFuzz.generate(seed)
    q(f"qf_gen_$seed%02d", QueryFuzz.toSql(fq)) { (s, dir) =>
      QueryFuzz.toDataFrame(fq, s, dir)
    }
  }
  // v2 seeds chosen (by shape audit) to cover every new shape kind:
  // 1 = SEMI customer⋉orders with right pred, 3 = ANTI lineitem▷orders
  // with right pred, 4 = INTERSECT lineitem, 5 = HAVING on k_year,
  // 6 = EXCEPT lineitem, 8 = plain SEMI lineitem⋉orders, 11 = two-key
  // HAVING without pred, 26 = UNION ALL customer, 52 = ANTI
  // customer▷orders (the pair whose anti side is naturally non-empty).
  // Fixed forever, like v1.
  private val gateSeedsV2: Seq[Long] = Seq(1, 3, 4, 5, 6, 8, 11, 26, 52)
  for (seed <- gateSeedsV2) {
    val fq = QueryFuzz.generateV2(seed)
    q(f"qf2_gen_$seed%02d", QueryFuzz.toSql(fq)) { (s, dir) =>
      QueryFuzz.toDataFrame(fq, s, dir)
    }
  }
  // v3 seeds chosen (by shape audit at sf0.001) to cover every new
  // kind: 1 = num-exprs over orders⋈customer (length/substr bridge),
  // 2 = date expr over orders, 4/10 = ORDER BY expr ASC + LIMIT
  // (orders / customer), 5/9 = DESC over the join relations, 8/47 =
  // ROLLUP k=1 (orders / lineitem⋈orders), 12/44 = the full
  // num+str+date expression trees, 25/57 = ROLLUP k=2 (lineitem /
  // orders⋈customer). All audited non-empty at sf0.001 — REQUIRED for
  // rollup gate seeds: Spark emits NO grand-total row for
  // ROLLUP/CUBE/GROUPING SETS over EMPTY input while DuckDB (per the
  // SQL standard, like Postgres) emits one — the v3 sweep's real
  // cross-engine find, pinned in QueryFuzzSpec. Fixed forever, like
  // v1/v2.
  private val gateSeedsV3: Seq[Long] = Seq(1, 2, 4, 5, 8, 9, 10, 12, 25, 44, 47, 57)
  for (seed <- gateSeedsV3) {
    val fq = QueryFuzz.generateV3(seed)
    q(f"qf3_gen_$seed%02d", QueryFuzz.toSql(fq)) { (s, dir) =>
      QueryFuzz.toDataFrame(fq, s, dir)
    }
  }
}
