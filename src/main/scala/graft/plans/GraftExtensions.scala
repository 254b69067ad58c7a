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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 0 =>
      bounded(a, b, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 0 =>
      bounded(a, b, k)
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 1 =>
      bounded(a, b, k - 1)
    case LessThanOrEqual(Cast(Levenshtein(a, b, None), LongType, _, _),
        Literal(k: Long, LongType)) if k >= 0 && k <= Int.MaxValue =>
      bounded(a, b, k.toInt)
    case GreaterThanOrEqual(Literal(k: Long, LongType),
        Cast(Levenshtein(a, b, None), LongType, _, _)) if k >= 0 && k <= Int.MaxValue =>
      bounded(a, b, k.toInt)
  }
}

/** Session extensions entry point — wire with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (done in [[graft.Engine.session]] and the test session). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => BoundedEditDistanceRule)
}
