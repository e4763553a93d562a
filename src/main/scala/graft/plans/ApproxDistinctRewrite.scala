package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in Catalyst optimizer rule: rewrite exact `COUNT(DISTINCT x)`
  * to the HyperLogLog++ sketch aggregate.
  *
  * Why a RULE and not a code change: at 100 TB an exact distinct is a
  * full shuffle of every distinct key (and under grouping, Spark's
  * distinct-aggregate planning runs an Expand that multiplies the
  * scan); the sketch form is a fixed few-KB buffer per group,
  * map-side combined. Flipping one session conf turns a fleet of
  * existing dashboards/queries approximate during an incident or an
  * exploration pass — no query rewrites, and flipping it back restores
  * exactness. The rewrite happens where it belongs: in the plan, for
  * every query in the session, including raw SQL the engine never saw
  * as code.
  *
  * Scope guards: single-argument COUNT(DISTINCT) only (HLL++ is
  * unary); aggregate FILTER clauses are carried through unchanged.
  *
  * Enable with `SET spark.graft.approxDistinct = true`; tune the
  * sketch's relative standard deviation via
  * `spark.graft.approxDistinct.rsd` (default 0.05, same as
  * `approx_count_distinct`).
  */
case class ApproxDistinctRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = session.conf.getOption("spark.graft.approxDistinct")
      .exists(_.equalsIgnoreCase("true"))
    if (!enabled) plan
    else {
      val rsd = session.conf.getOption("spark.graft.approxDistinct.rsd")
        .map(_.toDouble).getOrElse(0.05)
      plan.transform {
        case agg: Aggregate =>
          agg.transformExpressions {
            case AggregateExpression(c: Count, mode, true, filter, _)
                if c.children.size == 1 =>
              AggregateExpression(
                HyperLogLogPlusPlus(c.children.head, rsd), mode,
                isDistinct = false, filter)
          }
      }
    }
  }
}
