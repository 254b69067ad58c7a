package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Shared analysis-time type check for the primitive-long-array
  * kernels (merge walk, bitmap popcount, simhash votes).
  *
  * NULL ELEMENTS: these kernels read primitive slots without isNullAt —
  * a null element is silently seen as 0. containsNull=true is still
  * accepted because lambda-built arrays (transform over a nullable
  * input) are STATICALLY nullable even when provably null-free, and
  * every in-repo producer (null-filtered token prep, bitmap encoding,
  * minhash signatures) cannot emit null elements. New producers must
  * preserve that guarantee — enforced here in one place by contract,
  * not per copy-pasted check. */
private[functions] object KernelTypeCheck {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, LongType}

  def longArrays(name: String, exprs: Expression*): TypeCheckResult = {
    val ok = exprs.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<bigint> inputs, got " +
        exprs.map(_.dataType.simpleString).mkString(" and "))
  }
}

/** Intersection size of two SORTED int64 arrays via a linear merge
  * walk — a custom Catalyst expression with full codegen.
  *
  * Why custom: the built-in `array_intersect` materializes a boxed
  * hash set per evaluation. In pair-verification joins (MinHash-LSH,
  * n-gram Jaccard) that evaluation runs once per CANDIDATE PAIR, which
  * at 100 TB is the hot loop of the whole dedup pipeline. The merge
  * walk reads primitive longs straight out of the two ArrayData (no
  * boxing, no allocation) and stays inside whole-stage codegen.
  *
  * Jaccard then needs no union materialization either:
  * |A ∪ B| = |A| + |B| - |A ∩ B| for distinct-element arrays.
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeCheck.longArrays("sorted_long_intersect_size", left, right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val an = a.numElements(); val bn = b.numElements()
    while (i < an && j < bn) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val an = ctx.freshName("an"); val bn = ctx.freshName("bn")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0, $j = 0;
         |final int $an = $a.numElements(), $bn = $b.numElements();
         |${ev.value} = 0;
         |while ($i < $an && $j < $bn) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { ${ev.value}++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Jaccard of two bitmap-encoded sets (array<long> of equal width):
  * popcount(a AND b) / popcount(a OR b), 0.0 when both empty.
  *
  * Why: when a corpus' distinct (hashed) token universe is small enough
  * to dictionary-encode — boilerplate-heavy crawls, template corpora —
  * a token SET becomes a few machine words, so pair-verification rows
  * in the dedup joins shrink from full arrays (~8B/token) to w words,
  * and the per-pair Jaccard collapses from a merge walk to two
  * popcounts. Same output as [[ArrayOps.sortedJaccard]] over the
  * hashed sets the bitmap encodes.
  */
case class BitmapJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeCheck.longArrays("bitmap_jaccard", left, right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val an = a.numElements(); val bn = b.numElements()
    val n = math.min(an, bn)
    var i = 0; var inter = 0L; var uni = 0L
    while (i < n) {
      val x = a.getLong(i); val y = b.getLong(i)
      inter += java.lang.Long.bitCount(x & y)
      uni += java.lang.Long.bitCount(x | y)
      i += 1
    }
    while (i < an) { uni += java.lang.Long.bitCount(a.getLong(i)); i += 1 }
    while (i < bn) { uni += java.lang.Long.bitCount(b.getLong(i)); i += 1 }
    if (uni == 0L) 0.0 else inter.toDouble / uni.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val an = ctx.freshName("an"); val bn = ctx.freshName("bn")
      val n = ctx.freshName("n")
      val inter = ctx.freshName("inter"); val uni = ctx.freshName("uni")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $an = $a.numElements(), $bn = $b.numElements();
         |final int $n = Math.min($an, $bn);
         |long $inter = 0L, $uni = 0L;
         |int $i = 0;
         |while ($i < $n) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($i);
         |  $inter += java.lang.Long.bitCount($x & $y);
         |  $uni += java.lang.Long.bitCount($x | $y);
         |  $i++;
         |}
         |while ($i < $an) { $uni += java.lang.Long.bitCount($a.getLong($i)); $i++; }
         |while ($i < $bn) { $uni += java.lang.Long.bitCount($b.getLong($i)); $i++; }
         |${ev.value} = ($uni == 0L) ? 0.0 : ((double) $inter) / ((double) $uni);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapJaccard =
    copy(left = newLeft, right = newRight)
}

object ArrayOps {

  /** Column form of [[SortedLongIntersectSize]] — inputs MUST be sorted
    * distinct int64 arrays (pair with `sort_array(array_distinct(_))`). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftShim.column(SortedLongIntersectSize(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** Jaccard over sorted distinct int64 arrays, allocation-free:
    * |A∩B| / (|A|+|B|-|A∩B|); 0.0 when either side is empty. */
  def sortedJaccard(a: Column, b: Column): Column = {
    val inter = sortedIntersectSize(a, b).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(size(a) === 0 || size(b) === 0, 0.0).otherwise(inter / union)
  }

  /** Column form of [[BitmapJaccard]] — inputs are equal-width
    * array<long> bitmaps over one shared dictionary. */
  def bitmapJaccard(a: Column, b: Column): Column =
    GraftShim.column(BitmapJaccard(
      GraftShim.expression(a), GraftShim.expression(b)))
}
