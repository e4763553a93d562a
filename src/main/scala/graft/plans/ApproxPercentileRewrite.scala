package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ElementAt, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.{TDigestQuantiles, TDigestWeightedQuantiles}

/** Opt-in Catalyst optimizer rule — the quantile sibling of
  * [[ApproxDistinctRewrite]]: rewrite exact `percentile(x, p)` /
  * `percentile(x, array(...))` / `percentile(x, p, freq)` to the
  * mergeable t-digest aggregate ([[TDigestQuantiles]] /
  * [[TDigestWeightedQuantiles]]).
  *
  * Why: exact Percentile buffers EVERY distinct value with its count
  * per group (an OpenHashMap serialized between stages) — at 100 TB a
  * high-cardinality column makes that buffer the shuffle. The digest
  * is a bounded ~8δ-centroid summary with tail-biased rank error, so
  * one session conf turns a fleet of existing percentile dashboards
  * approximate during an incident — including raw SQL — and flipping
  * it back restores exactness.
  *
  * Shape discipline: a scalar-percentage Percentile evaluates to
  * DOUBLE while the digest aggregate returns ARRAY<DOUBLE>, so the
  * scalar form is rewritten to `element_at(tdigest(...), 1)` — an
  * aggregate nested in a scalar expression, exactly how Catalyst
  * plans `sum(x) + 1`. A non-literal frequency argument maps to the
  * weighted digest. Guards: foldable percentages, non-DISTINCT,
  * non-reverse; FILTER clauses carry through.
  *
  * Enable with `SET spark.graft.approxPercentile = true`; tune via
  * `spark.graft.approxPercentile.compression` (default 100).
  */
case class ApproxPercentileRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = session.conf.getOption("spark.graft.approxPercentile")
      .exists(_.equalsIgnoreCase("true"))
    if (!enabled) plan
    else {
      val delta = session.conf.getOption("spark.graft.approxPercentile.compression")
        .map(_.toInt).getOrElse(100)
      plan.transform {
        case agg: Aggregate =>
          agg.transformExpressions {
            case ae @ AggregateExpression(p: Percentile, mode, false, filter, _)
                if !p.reverse && p.percentageExpression.foldable =>
              def build(ps: Seq[Double], scalar: Boolean) = {
                val digest = p.frequencyExpression match {
                  case Literal(1L, _) | Literal(1, _) =>
                    TDigestQuantiles(p.child, ps, delta)
                  case freq =>
                    TDigestWeightedQuantiles(p.child, freq, ps, delta)
                }
                val rewritten = AggregateExpression(digest, mode,
                  isDistinct = false, filter)
                if (scalar) ElementAt(rewritten, Literal(1)) else rewritten
              }
              p.percentageExpression.eval() match {
                case a: ArrayData => build(a.toDoubleArray().toSeq, scalar = false)
                case n: java.lang.Number => build(Seq(n.doubleValue()), scalar = true)
                case d: org.apache.spark.sql.types.Decimal => build(Seq(d.toDouble), scalar = true)
                case _ => ae // null / unanticipated type: leave the query unrewritten
              }
          }
      }
    }
  }
}
