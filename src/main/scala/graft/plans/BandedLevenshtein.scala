package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite comparisons of the UNBOUNDED
  * `levenshtein(a, b)` against a non-negative integer literal into
  * the banded threshold form — `levenshtein(a, b) <= k` becomes
  * `levenshtein(a, b, k) >= 0` — turning the O(|a|·|b|) full DP into
  * the O(k·min) diagonal band (the threshold form returns -1 the
  * moment the band proves the distance exceeds k; the -1 contract is
  * pinned in EditJoinSpec).
  *
  * Why a Rule and not a coding convention: the predicate is what a
  * SQL user naturally writes (qx29 declares the edit join as one SQL
  * string with `levenshtein(ta, tb) <= 12`), and the engine — not
  * the query author — should know the banded evaluation exists.
  * This is the `injectOptimizerRule` rung of the extension ladder:
  * the rewrite is pure expression algebra, so no custom plan node or
  * strategy is warranted.
  *
  * Soundness, case by case over d = lev(a, b) and the band form
  * b_k = lev(a, b, k) (= d when d <= k, -1 otherwise; NULL exactly
  * when d is NULL, so three-valued logic carries unchanged):
  *
  *  - d <= k  (k >= 0) <=> b_k >= 0
  *  - d <  k  (k >= 1) <=> b_{k-1} >= 0
  *  - d >  k  (k >= 0) <=> b_k < 0
  *  - d >= k  (k >= 1) <=> b_{k-1} < 0
  *  - d =  k  (k >= 0) <=> b_k = k
  *
  * (`d < 0` / `d >= 0` are constant-foldable elsewhere and left
  * alone.) Only bare IntegerType literals are matched — constant
  * folding runs in the same fixed-point batch, so foldable
  * thresholds reach literal form before this rule sees them; a
  * widened/cast comparison is left untouched rather than guessed at.
  * The rewritten form has a defined threshold and can never re-match,
  * so the batch converges.
  */
object BandedLevenshteinRewrite extends Rule[LogicalPlan] {

  private object K {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(k: Int, IntegerType) => Some(k)
      case _ => None
    }
  }

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    Levenshtein(l, r, Some(Literal(k)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees
        .TreePattern.BINARY_COMPARISON)) {
      case LessThanOrEqual(Levenshtein(l, r, None), K(k)) if k >= 0 =>
        GreaterThanOrEqual(banded(l, r, k), Literal(0))
      case GreaterThanOrEqual(K(k), Levenshtein(l, r, None)) if k >= 0 =>
        GreaterThanOrEqual(banded(l, r, k), Literal(0))
      case LessThan(Levenshtein(l, r, None), K(k)) if k >= 1 =>
        GreaterThanOrEqual(banded(l, r, k - 1), Literal(0))
      case GreaterThan(K(k), Levenshtein(l, r, None)) if k >= 1 =>
        GreaterThanOrEqual(banded(l, r, k - 1), Literal(0))
      case GreaterThan(Levenshtein(l, r, None), K(k)) if k >= 0 =>
        LessThan(banded(l, r, k), Literal(0))
      case LessThan(K(k), Levenshtein(l, r, None)) if k >= 0 =>
        LessThan(banded(l, r, k), Literal(0))
      case GreaterThanOrEqual(Levenshtein(l, r, None), K(k)) if k >= 1 =>
        LessThan(banded(l, r, k - 1), Literal(0))
      case LessThanOrEqual(K(k), Levenshtein(l, r, None)) if k >= 1 =>
        LessThan(banded(l, r, k - 1), Literal(0))
      case EqualTo(Levenshtein(l, r, None), K(k)) if k >= 0 =>
        EqualTo(banded(l, r, k), Literal(k))
      case EqualTo(K(k), Levenshtein(l, r, None)) if k >= 0 =>
        EqualTo(banded(l, r, k), Literal(k))
    }
}
