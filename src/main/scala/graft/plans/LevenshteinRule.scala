package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite unbounded edit-distance comparisons into the
  * bounded (early-exit) form.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic
  * program for every pair and then throws most of the work away;
  * `levenshtein(a, b, k)` abandons a row as soon as the running
  * distance exceeds `k` (returning −1), which on the far-apart majority
  * of fuzzy-join candidates is the difference between O(len²) and
  * O(k·len) per pair (measured 4× CPU on the q92 blocked-pairs shape).
  * Users write the natural predicate; this rule injects the bound —
  * the query-rewrite kind of optimization Catalyst can't know is safe
  * without the `-1` contract, which is exactly why it lives here.
  *
  * Soundness: for k ≥ 0, `lev(a,b) <= k  ⇔  lev(a,b,k) >= 0` — the
  * bounded form returns the true distance when ≤ k and −1 otherwise,
  * and null propagates identically on both sides. `<` lowers through
  * `<= k−1`; literal-on-the-left comparisons mirror. Registered via
  * [[GraftExtensions]] (`injectOptimizerRule`).
  *
  * Scope: `transformAllExpressions` reaches every operator's
  * expressions, so the rewrite fires in Filter predicates AND inside
  * Join conditions — the blocked fuzzy-linkage join (q92's shape,
  * equi-block + levenshtein residual) is where it pays most
  * (spec-proven in `LevenshteinRuleSpec`).
  */
object BoundLevenshtein extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev(a,b) <= k  /  k >= lev(a,b)
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 => bounded(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 => bounded(a, b, k)
      // lev(a,b) < k  /  k > lev(a,b)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 => bounded(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 => bounded(a, b, k - 1)
    }
}
