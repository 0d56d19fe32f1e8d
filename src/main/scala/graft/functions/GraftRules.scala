package graft.functions

import org.apache.spark.sql.catalyst.expressions.Lower
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rules for the graft expressions, injected via
  * [[GraftExtensions]] (`injectOptimizerRule`) at session build, or added to
  * an existing session with [[GraftExtensions.registerRules]].
  *
  * `NormalizeLowerElision` rewrites `graft_normalize(lower(x))` to
  * `graft_normalize(x)`. The N1 normalize (reference: internal/text/
  * text.go:37-64) begins with the SAME lowercase the built-in `lower()`
  * performs (`UTF8String.toLowerCase` — NormalizeExpr pins this), and
  * lowercasing is idempotent (lowercase mappings land on characters that
  * lowercase to themselves; pinned by the ScalaCheck property in
  * GraftRulesSpec including the U+0130 'İ' full mapping, ß, final sigma,
  * fullwidth and supplementary-plane letters). So the inner `lower` is a
  * redundant full string pass + allocation per row, which pipelines that
  * case-fold defensively before normalizing would otherwise pay on the
  * chunker hot path.
  *
  * A rewrite this rule deliberately does NOT contain: collapsing
  * `graft_normalize(graft_normalize(x))`. N1 is NOT idempotent — run
  * collapsing happens BEFORE the character filter, so a run-breaking char
  * that is itself removed leaves two adjacent spaces ("a . b" → "a  b"),
  * which a second pass would merge ("a b"). The double application is a
  * semantic change the reference user can observe; GraftRulesSpec pins the
  * counterexample so the tempting rule is never added.
  *
  * The bottom-up expression walk fires wherever the pattern appears
  * (including under hashes: `fnv1a64(graft_normalize(lower(x)))`), and
  * collapses `normalize(lower(lower(x)))` chains in one pass.
  */
object NormalizeLowerElision extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan transformUp {
      case p => p transformExpressionsUp {
        case NormalizeExpr(Lower(inner)) => NormalizeExpr(inner)
      }
    }
}
