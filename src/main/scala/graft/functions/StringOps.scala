package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Non-overlapping substring occurrence count via an indexOf walk — a
  * custom Catalyst expression with full codegen.
  *
  * Why custom: the composable form `(length(s) - length(replace(s, m)))
  * / length(m)` ALLOCATES a rewritten copy of the string per marker per
  * row; language-ID scores a document against dozens of markers, so the
  * hot loop was one string copy per (doc, marker). The indexOf walk
  * reads the backing bytes in place (UTF8String.indexOf, no
  * allocation). Matches the replace-based count exactly: both count
  * left-to-right non-overlapping matches.
  */
case class SubstringCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == StringType && right.dataType == StringType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"substring_count expects two string inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val s = l.asInstanceOf[UTF8String]
    val m = r.asInstanceOf[UTF8String]
    val mLen = m.numChars()
    if (mLen == 0) 0L
    else {
      var count = 0L
      var pos = s.indexOf(m, 0)
      while (pos >= 0) {
        count += 1
        pos = s.indexOf(m, pos + mLen)
      }
      count
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, m) => {
      val mLen = ctx.freshName("mLen")
      val pos = ctx.freshName("pos")
      s"""
         |final int $mLen = $m.numChars();
         |${ev.value} = 0L;
         |if ($mLen > 0) {
         |  int $pos = $s.indexOf($m, 0);
         |  while ($pos >= 0) {
         |    ${ev.value}++;
         |    $pos = $s.indexOf($m, $pos + $mLen);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubstringCount =
    copy(left = newLeft, right = newRight)
}

object StringOps {

  /** Column form of [[SubstringCount]]. */
  def substringCount(s: Column, marker: Column): Column =
    GraftShim.column(SubstringCount(
      GraftShim.expression(s), GraftShim.expression(marker)))
}
