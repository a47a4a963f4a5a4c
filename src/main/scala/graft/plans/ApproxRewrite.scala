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

/** Opt-in exact→approximate percentile rewrite, same AQP contract as
  * [[ApproxCountDistinctRewrite]]: under
  * `spark.graft.approx.percentile=true`, `percentile(x, p)` becomes
  * `approx_percentile(x, p, accuracy)` — swapping the
  * buffer-every-value aggregate for the mergeable bounded-memory
  * Greenwald-Khanna sketch. This is the session-wide guard rail for
  * ad-hoc SQL: a user's exact global percentile at 100 TB would OOM
  * the final reducer; with the flag set it degrades to a bounded-error
  * sketch instead of failing.
  *
  * Only the frequency-1 form is rewritten (weighted percentiles have
  * no approx counterpart with matching semantics).
  */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, Percentile}

  final val ConfKey = "spark.graft.approx.percentile"
  final val AccuracyKey = "spark.graft.approx.percentile.accuracy"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    val accuracy = conf.getConfString(AccuracyKey, "10000").toInt
    plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          // DoubleType children only: Percentile always returns
          // DoubleType but ApproximatePercentile returns
          // child.dataType, so rewriting an int column would change
          // the aggregate's result type after analysis — a plan whose
          // physical output no longer matches its declared schema.
          case ae @ AggregateExpression(
              Percentile(child, percentage, frequency, _, _, reverse), _, _, _, _)
              if !reverse && frequency.foldable
                && frequency.eval() == 1L
                && child.dataType == org.apache.spark.sql.types.DoubleType =>
            ae.copy(aggregateFunction =
              new ApproximatePercentile(child, percentage,
                Literal(accuracy)))
        }
    }
  }
}

/** Extension installer for the AQP rewrites (compose with
  * GraftExtensions or use standalone via spark.sql.extensions).
  */
class ApproxExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => ApproxCountDistinctRewrite)
    ext.injectOptimizerRule(_ => ApproxPercentileRewrite)
  }
}
