package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the custom as-of node — the `Rule[LogicalPlan]`
  * extension point (the one tier-(c) surface a custom operator still needs
  * after its Strategy): Catalyst's own predicate pushdown walks KNOWN
  * nodes; a Filter sitting on top of [[AsOfJoinPlan]] would otherwise
  * stay put and the left scan would read every row below it.
  *
  * Push rules, mirroring what pushdown does for left-outer joins:
  *   - a conjunct referencing only LEFT output moves below the join into
  *     the left child (as-of keeps left rows 1:1 — filtering before or
  *     after is identical);
  *   - conjuncts touching the right side stay put: the right columns are
  *     null-extended on miss, so pushing them into the right child would
  *     turn misses into row drops (the classic outer-join pushdown trap).
  *
  * From the left child the predicate keeps sinking through Catalyst's own
  * rules — at 100 TB that is the difference between shuffling the full
  * fact table into the as-of exchange and shuffling the filtered slice
  * (PlanRegressionSpec pins `PushedFilters` reaching the parquet scan).
  * Register build-time via `GraftExtensions` (injectOptimizerRule) or
  * runtime via `spark.experimental.extraOptimizations` (what [[AsOf]]
  * does).
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, asof: AsOfJoinPlan) =>
      val (pushable, kept) = splitConjuncts(cond).partition { c =>
        c.deterministic && c.references.subsetOf(asof.left.outputSet)
      }
      if (pushable.isEmpty) f
      else {
        val pushed = asof.copy(left = Filter(pushable.reduce(And), asof.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
