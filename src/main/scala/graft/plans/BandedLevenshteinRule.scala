package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: evaluate thresholded edit-distance predicates with
  * the banded DP.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|·|b|) matrix and
  * then compares; Spark's thresholded `levenshtein(a, b, k)` runs the
  * banded O(max(|a|,|b|)·k) variant that abandons a row as soon as the
  * band is exceeded (returning -1). The two predicates are exactly
  * equivalent:
  *
  *   lev(a,b) <= k   ⟺   lev(a,b,k) >= 0
  *   lev(a,b) =  k   ⟺   lev(a,b,k) =  k
  *
  * so any filter written the natural way is rewritten to the banded
  * form. For a dedup pipeline comparing document-sized strings at a
  * small edit threshold this is a ~len/k speedup on the verify stage —
  * the user writes the obvious predicate and the plan runs the banded
  * algorithm (the same contract as Catalyst's own
  * constant-folding/pushdown rules: declarative in, efficient out).
  *
  * Only fires on filter conditions whose threshold is a non-negative
  * integer literal; the distance value itself (projections, order-bys)
  * is never rewritten, since its full value is genuinely needed there.
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] {

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(l, r, Some(Literal(k))), Literal(0))

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    // lev(a,b) <= k  /  k >= lev(a,b)
    case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
        if k >= 0 => banded(l, r, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
        if k >= 0 => banded(l, r, k)
    // lev(a,b) < k  /  k > lev(a,b)
    case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
        if k >= 1 => banded(l, r, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
        if k >= 1 => banded(l, r, k - 1)
    // lev(a,b) = k: banded distance equals k iff true distance does
    case EqualTo(Levenshtein(l, r, None), lit @ Literal(k: Int, IntegerType))
        if k >= 0 => EqualTo(Levenshtein(l, r, Some(Literal(k))), lit)
    case EqualTo(lit @ Literal(k: Int, IntegerType), Levenshtein(l, r, None))
        if k >= 0 => EqualTo(Levenshtein(l, r, Some(Literal(k))), lit)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = rewrite(cond)
      if (newCond.fastEquals(cond)) f else Filter(newCond, child)
  }
}
