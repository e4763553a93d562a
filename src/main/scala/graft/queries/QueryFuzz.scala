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
        val over = s"PARTITION BY $part ORDER BY l_orderkey, l_linenumber"
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
        val order = Window.partitionBy(part).orderBy(col("l_orderkey"), col("l_linenumber"))
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
}
