package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite comparisons of the UNBOUNDED
  * `levenshtein(a, b)` against a non-negative integer literal into
  * the banded threshold form — `levenshtein(a, b) <= k` becomes
  * `abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0` —
  * turning the O(|a|·|b|) full DP into a length short-circuit in
  * front of the O(k·min) diagonal band (the threshold form returns
  * -1 the moment the band proves the distance exceeds k; the -1
  * contract is pinned in EditJoinSpec).
  *
  * Why a Rule and not a coding convention: the predicate is what a
  * SQL user naturally writes (qx29 declares the edit join as one SQL
  * string with `levenshtein(ta, tb) <= 12`), and the engine — not
  * the query author — should know both that the banded evaluation
  * exists AND that `ed >= |len(a) - len(b)|` makes the length guard
  * sound (EditJoin tier 1's economics from bare SQL; round 14,
  * ADVICE r13 #2). This is the `injectOptimizerRule` rung of the
  * extension ladder: the rewrite is pure expression algebra, so no
  * custom plan node or strategy is warranted.
  *
  * Soundness, case by case over d = lev(a, b) and the band form
  * b_k = lev(a, b, k) (= d when d <= k, -1 otherwise; NULL exactly
  * when d is NULL, so three-valued logic carries unchanged):
  *
  *  - d <= k  (k >= 0) <=> |Δlen| <= k AND b_k >= 0
  *  - d <  k  (k >= 1) <=> |Δlen| <= k-1 AND b_{k-1} >= 0
  *  - d >  k  (k >= 0) <=> |Δlen| > k OR b_k < 0
  *  - d >= k  (k >= 1) <=> |Δlen| > k-1 OR b_{k-1} < 0
  *  - d =  k  (k >= 0) <=> |Δlen| <= k AND b_k = k
  *
  * The length conjunct/disjunct is sound because every edit changes
  * the length by at most one, so d >= |Δlen|; it is EXACTLY the
  * guard the comparison needs (never weaker), and the null domains
  * coincide — length(x) is NULL iff x is NULL iff lev is NULL, and
  * when the guard is non-null and decides the answer the banded leg
  * is also non-null, so FALSE AND / TRUE OR short-circuits agree
  * with the unguarded truth value. A query that already carries its
  * own length prune (qx29 does, on precomputed len columns) gets a
  * redundant conjunct over attributes the row already holds — two
  * length scans per DP-bound candidate, noise next to the DP saved
  * when the guard is absent.
  *
  * (`d < 0` / `d >= 0` are constant-foldable elsewhere and left
  * alone.) Only bare IntegerType literals are matched — constant
  * folding runs in the same fixed-point batch, so foldable
  * thresholds reach literal form before this rule sees them; a
  * widened/cast comparison is left untouched rather than guessed at.
  * The rewritten form has a defined threshold and can never re-match
  * (the injected guard contains no levenshtein at all), so the batch
  * converges.
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

  /** `abs(length(l) - length(r)) <= k` — the tier-1 length prune. */
  private def lenDiff(l: Expression, r: Expression): Expression =
    Abs(Subtract(Length(l), Length(r)))

  /** The injected guard duplicates both operands (once under Length,
    * once in the banded DP): sound only when they are deterministic —
    * a non-deterministic operand would see two different values and
    * change result semantics, and standard optimizer-rule practice is
    * to not duplicate such expressions at all. Non-deterministic
    * operands still get the banded DP (single evaluation, same
    * truth), just not the length short-circuit.
    */
  private def canGuard(l: Expression, r: Expression): Boolean =
    l.deterministic && r.deterministic

  /** Distance-small direction: guard first, band second, so codegen
    * short-circuits non-candidates before the DP.
    */
  private def within(l: Expression, r: Expression, k: Int): Expression = {
    val band = GreaterThanOrEqual(banded(l, r, k), Literal(0))
    if (canGuard(l, r))
      And(LessThanOrEqual(lenDiff(l, r), Literal(k)), band)
    else band
  }

  /** Distance-large direction: a length gap past k alone proves
    * d > k, so the guard short-circuits the DP as a disjunct.
    */
  private def beyond(l: Expression, r: Expression, k: Int): Expression = {
    val band = LessThan(banded(l, r, k), Literal(0))
    if (canGuard(l, r))
      Or(GreaterThan(lenDiff(l, r), Literal(k)), band)
    else band
  }

  /** `d = k`: band equality, length-guarded when sound. */
  private def exactly(l: Expression, r: Expression, k: Int): Expression = {
    val band = EqualTo(banded(l, r, k), Literal(k))
    if (canGuard(l, r))
      And(LessThanOrEqual(lenDiff(l, r), Literal(k)), band)
    else band
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees
        .TreePattern.BINARY_COMPARISON)) {
      case LessThanOrEqual(Levenshtein(l, r, None), K(k)) if k >= 0 =>
        within(l, r, k)
      case GreaterThanOrEqual(K(k), Levenshtein(l, r, None)) if k >= 0 =>
        within(l, r, k)
      case LessThan(Levenshtein(l, r, None), K(k)) if k >= 1 =>
        within(l, r, k - 1)
      case GreaterThan(K(k), Levenshtein(l, r, None)) if k >= 1 =>
        within(l, r, k - 1)
      case GreaterThan(Levenshtein(l, r, None), K(k)) if k >= 0 =>
        beyond(l, r, k)
      case LessThan(K(k), Levenshtein(l, r, None)) if k >= 0 =>
        beyond(l, r, k)
      case GreaterThanOrEqual(Levenshtein(l, r, None), K(k)) if k >= 1 =>
        beyond(l, r, k - 1)
      case LessThanOrEqual(K(k), Levenshtein(l, r, None)) if k >= 1 =>
        beyond(l, r, k - 1)
      case EqualTo(Levenshtein(l, r, None), K(k)) if k >= 0 =>
        exactly(l, r, k)
      case EqualTo(K(k), Levenshtein(l, r, None)) if k >= 0 =>
        exactly(l, r, k)
    }
}
