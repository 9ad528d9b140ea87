package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.NormalizeWord

/** Optimizer rule: `normalize_word` is idempotent
  * (strip∘lower∘strip∘lower = strip∘lower — property-tested in
  * WordCountPropertySpec), so nested applications collapse to one.
  *
  * Composed pipelines hit this for real: a cleaning stage that
  * normalizes tokens feeding a word-count stage that normalizes again
  * would otherwise pay two byte passes per token at 100 TB. Injected
  * through [[graft.GraftExtensions]] (`injectOptimizerRule`), so any
  * session built with the extension optimizes user-written plans too.
  */
object CollapseNormalizeWord extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NormalizeWord(inner @ NormalizeWord(_)) => inner
    }
}
