package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Non-overlapping substring occurrence count via a byte-offset find
  * walk — a custom Catalyst expression with full codegen.
  *
  * Why custom: the composable form `(length(s) - length(replace(s, m)))
  * / length(m)` ALLOCATES a rewritten copy of the string per marker per
  * row; language-ID scores a document against dozens of markers, so the
  * hot loop was one string copy per (doc, marker). The walk reads the
  * backing bytes in place with zero allocation.
  *
  * Byte offsets, not char offsets: `UTF8String.indexOf(m, start)`
  * takes a CHAR position and re-walks the string from byte 0 to locate
  * it, so an indexOf loop is O(matches x length) — quadratic on
  * marker-dense documents. `find(m, bytePos)` resumes at a byte
  * position directly, making the whole count one linear pass. The
  * match sets are identical: UTF-8 is self-synchronizing, so a valid
  * marker can never match at a non-boundary byte offset. Matches the
  * replace-based count exactly: both count left-to-right
  * non-overlapping matches.
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
    val mBytes = m.numBytes()
    if (mBytes == 0) 0L
    else {
      var count = 0L
      var pos = s.find(m, 0)
      while (pos >= 0) {
        count += 1
        pos = s.find(m, pos + mBytes)
      }
      count
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, m) => {
      val mBytes = ctx.freshName("mBytes")
      val pos = ctx.freshName("pos")
      s"""
         |final int $mBytes = $m.numBytes();
         |${ev.value} = 0L;
         |if ($mBytes > 0) {
         |  int $pos = $s.find($m, 0);
         |  while ($pos >= 0) {
         |    ${ev.value}++;
         |    $pos = $s.find($m, $pos + $mBytes);
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
