package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine rounding.
  *
  * `round(x, n)` is NOT portable at decimal boundaries: Spark rounds
  * the shortest decimal representation (BigDecimal HALF_UP, so
  * 70.47625 → 70.4763) while DuckDB rounds the binary value
  * (70.47625 is stored as 70.47624999…, so → 70.4762). We instead use
  * one explicit expression on BOTH engines:
  *
  *   floor(x * 1eN + 0.5 + 1e-6) / 1eN
  *
  * Identical inputs ⇒ identical IEEE ops ⇒ identical outputs. The 1e-6
  * nudge makes exact-boundary rationals (an avg over n=2^k rows of
  * 2-decimal data lands on x.xxxx5 constantly) round UP consistently
  * even when the two engines' summation orders differ in the last few
  * ulps; non-boundary values (>1e-10 away) are unaffected.
  *
  * PORTABILITY CEILING (measured — fuzz sweep r13, seed v3_075):
  * Spark's `floor` returns LONG and CLAMPS at Long.MaxValue while
  * DuckDB's returns double, so the expression diverges once
  * |x·1eN| > 2^63 — i.e. |x| ≳ 9.2e16 for r2, 9.2e14 for r4. Every
  * oracle column in this engine sits orders of magnitude below that;
  * if one ever approaches it, the value should ship UNROUNDED (a
  * per-row expression computed by the identical IEEE tree is
  * bit-equal across engines without rounding — rounding is only
  * needed where summation ORDER differs, i.e. aggregates).
  */
object DetRound {
  def r4(c: Column): Column =
    floor(c * lit(1.0e4) + lit(0.5) + lit(1.0e-6)) / lit(1.0e4)

  def r2(c: Column): Column =
    floor(c * lit(1.0e2) + lit(0.5) + lit(1.0e-6)) / lit(1.0e2)

  /** The same expression as DuckDB SQL text. */
  def sqlR4(e: String): String = s"floor(($e) * 1e4 + 0.5 + 1e-6) / 1e4"
  def sqlR2(e: String): String = s"floor(($e) * 1e2 + 0.5 + 1e-6) / 1e2"
}
