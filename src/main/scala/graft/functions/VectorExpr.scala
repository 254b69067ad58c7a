package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric arrays as a strict LEFT FOLD in DOUBLE —
  * custom Catalyst expression with codegen.
  *
  * Replaces `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: the
  * higher-order form allocates a zipped array and walks interpreted
  * lambdas per element, which in ANN scoring runs once per candidate
  * PAIR. The fold order (((0 + a0*b0) + a1*b1) + ...) is exactly the
  * DuckDB oracle's `list_reduce`, so similarities stay bit-identical.
  * Elements are widened to double before multiplying; inputs of
  * unequal length fold over the shorter prefix (a documented contract
  * both engines share). NULL ELEMENTS fail loudly: ArrayData reads a
  * null slot as 0.0, which would silently zero one term while the
  * oracle's list arithmetic nulls the whole product — a cross-engine
  * divergence no gate would name. Top-level null arrays still yield
  * null (BinaryExpression null-intolerance).
  */
case class DotProductFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product_fold expects array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val leftFloat = elemType(left) == FloatType
    val rightFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"dot_product_fold: null element at index $i — impute or drop " +
            "null embedding elements before scoring")
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      def get(arr: String, e: Expression) =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "dot_product_fold: null element at index " + $i +
         |      " — impute or drop null embedding elements before scoring");
         |  }
         |  ${ev.value} += ${get(a, left)} * ${get(b, right)};
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFold =
    copy(left = newLeft, right = newRight)
}

object VectorExpr {
  def dotProduct(a: Column, b: Column): Column =
    GraftShim.column(DotProductFold(GraftShim.expression(a), GraftShim.expression(b)))
}
