package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash assembly over an int64 token-hash array — custom Catalyst
  * expression with codegen: ONE pass over the array maintaining per-bit
  * vote counters, versus `bits` interpreted filter() walks with the
  * higher-order-function API. Bit j of the result is set iff more than
  * half the hashes have bit j set (2*ones > n). Empty arrays yield 0 —
  * callers filter those to match the explode-based reference semantics.
  */
case class SimHashFromHashes(child: Expression, bits: Int) extends UnaryExpression {

  // silently-wrong otherwise: `1L << 64` wraps to bit 0 (shift counts
  // are mod 64), double-counting votes; bits <= 0 hashes everything to 0
  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeCheck.longArrays("simhash_from_hashes", child)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val cnt = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) != 0L) cnt(j) += 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (2 * cnt(j) > n) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val j = ctx.freshName("jj")
      val h = ctx.freshName("h")
      // vote counters hoisted to mutable state: a per-row `new int[64]`
      // in the whole-stage-codegen loop is pure allocation/GC pressure
      val cnt = ctx.addMutableState("int[]", "simhashCnt",
        v => s"$v = new int[$bits];", forceInline = true)
      s"""
         |final int $n = $a.numElements();
         |java.util.Arrays.fill($cnt, 0);
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $a.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ((($h >> $j) & 1L) != 0L) $cnt[$j]++;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if (2 * $cnt[$j] > $n) ${ev.value} |= (1L << $j);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashFromHashes =
    copy(child = newChild)
}

object SimHashExpr {
  /** Column form: simhash of an int64 hash array. */
  def simhashFromHashes(hashes: Column, bits: Int): Column =
    GraftShim.column(SimHashFromHashes(GraftShim.expression(hashes), bits))
}
