package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: bound edit-distance comparisons.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic
  * program per row and then throws the distance away. The equivalent
  * bounded form short-circuits twice:
  *
  *   abs(length(a) - length(b)) <= k           -- necessary condition,
  *                                             -- O(1), no DP at all
  *   AND levenshtein(a, b, k) >= 0             -- banded DP, O(k·|a|),
  *                                             -- returns -1 past k
  *
  * Null semantics are preserved exactly (both forms are null iff an
  * input is null; the guard can only be false when both inputs are
  * non-null, where the original is a genuine false). The rewrite
  * matches the raw integer comparison and the long-cast form the
  * DataFrame API produces (`levenshtein(...).cast("long") <= 1L`).
  * Rewritten trees carry a `Some(threshold)` and no longer match, so
  * the rule reaches a fixed point in one pass.
  *
  * This is the fuzzy-join (q89) fast path at scale: the filter runs on
  * every CANDIDATE pair, so on blocked entity-resolution joins the
  * banded DP + length guard is the difference between O(pairs·n²) and
  * O(pairs·k·n) with most pairs rejected in O(1).
  */
object BoundedEditDistanceRule extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, k: Int): Expression = {
    val kLit = Literal(k)
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), kLit),
      GreaterThanOrEqual(Levenshtein(a, b, Some(kLit)), Literal(0)))
  }

  /** Extractor: `levenshtein(a, b)` (unthresholded, deterministic
    * inputs — the guard duplicates a and b, so a non-deterministic
    * input would be evaluated independently in guard and DP) either
    * raw or under the bigint cast the DataFrame API produces. */
  private object Lev {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(a, b, None) if a.deterministic && b.deterministic =>
        Some((a, b))
      case Cast(Levenshtein(a, b, None), LongType, _, _)
          if a.deterministic && b.deterministic =>
        Some((a, b))
      case _ => None
    }
  }

  /** Extractor: an int-valued literal bound (raw int or long ≤ 2³¹). */
  private object Bound {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(k: Int, IntegerType) => Some(k)
      case Literal(k: Long, LongType) if k <= Int.MaxValue && k >= Int.MinValue =>
        Some(k.toInt)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Lev(a, b), Bound(k)) if k >= 0 => bounded(a, b, k)
    case GreaterThanOrEqual(Bound(k), Lev(a, b)) if k >= 0 => bounded(a, b, k)
    case LessThan(Lev(a, b), Bound(k)) if k >= 1 => bounded(a, b, k - 1)
    case GreaterThan(Bound(k), Lev(a, b)) if k >= 1 => bounded(a, b, k - 1)
  }
}

/** Session extensions entry point — wire with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (done in [[graft.Engine.session]] and the test session). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => BoundedEditDistanceRule)
}
