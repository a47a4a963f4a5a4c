package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in approximate-query-processing rewrite (BlinkDB-style): when
  * `spark.graft.approx.countDistinct=true`, exact `COUNT(DISTINCT x)`
  * aggregates are rewritten to HyperLogLog++ sketches.
  *
  * Why a Rule[LogicalPlan] and not a code change at call sites: the
  * rewrite must apply to queries the engine does NOT own (ad-hoc
  * `spark.sql` from users) and must be switchable per session without
  * touching query text — exactly the job of an injected optimizer
  * rule. This is the engine's one custom Catalyst RULE (the custom
  * EXPRESSIONS live in graft.functions); everything else rides the
  * built-in optimizer per SURVEY §4.3.
  *
  * Semantics contract: sketch estimates replace exact counts — callers
  * opt in explicitly via the conf; the default is OFF and the rule is
  * a no-op.
  */
object ApproxCountDistinctRewrite extends Rule[LogicalPlan] {
  final val ConfKey = "spark.graft.approx.countDistinct"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          // Single-child COUNT(DISTINCT x) only: a multi-column
          // COUNT(DISTINCT a, b) counts distinct TUPLES (excluding rows
          // where ANY child is null) — sketching children.head alone
          // would estimate a semantically different quantity, so the
          // rewrite deliberately leaves multi-child counts exact.
          case ae @ AggregateExpression(Count(children), _, true, _, _)
              if children.size == 1 =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(children.head),
              isDistinct = false)
        }
    }
  }
}

/** Extension installer for the rewrite (compose with GraftExtensions
  * or use standalone via spark.sql.extensions).
  */
class ApproxExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => ApproxCountDistinctRewrite)
}
