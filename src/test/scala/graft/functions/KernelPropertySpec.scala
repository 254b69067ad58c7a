package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark.spark

/** Randomized (seeded, reproducible) equivalence properties for the
  * custom codegen kernels against their composable-function oracles —
  * these run through real DataFrames so the CODEGEN path is what's
  * exercised, not just nullSafeEval. */
class KernelPropertySpec extends AnyFunSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("SubstringCount == replace-based occurrence count (400 random cases)") {
    // small alphabet forces overlaps, repeats and marker-at-boundary
    def randText(n: Int) = (0 until n).map(_ => "ab ab b aa "(rnd.nextInt(11))).mkString
    val cases = (1 to 400).map { _ =>
      (randText(rnd.nextInt(60)), randText(1 + rnd.nextInt(4)))
    }.filter(_._2.nonEmpty)
    val df = cases.toDF("s", "m")
    val bad = df.select(
        StringOps.substringCount(col("s"), col("m")).as("got"),
        ((length(col("s")) - length(replace(col("s"), col("m"), lit("")))) /
          length(col("m"))).cast("long").as("want"))
      .where(col("got") =!= col("want"))
      .count()
    assert(bad == 0)
  }

  test("BitmapJaccard == sortedJaccard over dictionary masks (300 random set pairs)") {
    // random universe sizes spanning 1..3 mask words
    val cases = (1 to 300).map { _ =>
      val universe = 1 + rnd.nextInt(190)
      val dict = (0 until universe).map(_.toLong)
      def randSet() = dict.filter(_ => rnd.nextBoolean()).toArray
      val (a, b) = (randSet(), randSet())
      val w = (universe + 63) / 64
      def mask(s: Array[Long]) = {
        val m = new Array[Long](w)
        s.foreach(p => m((p >> 6).toInt) |= (1L << (p & 63)))
        m
      }
      (a.sorted, b.sorted, mask(a), mask(b))
    }
    val df = cases.toDF("ta", "tb", "ma", "mb")
    val rows = df.select(
        ArrayOps.bitmapJaccard(col("ma"), col("mb")).as("bm"),
        ArrayOps.sortedJaccard(col("ta"), col("tb")).as("sj"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"bitmap ${r.getDouble(0)} vs merge-walk ${r.getDouble(1)}")
    }
  }

  test("DotProductFold dies named on a null element (both codegen and interpreted)") {
    // ArrayData reads a null slot as 0.0 — a silently-zeroed term while
    // the oracle's list arithmetic nulls the whole product; the kernel
    // must fail by name instead
    val df = Seq((Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("a", "b")
    val err = intercept[Exception] {
      df.select(graft.functions.VectorExpr.dotProduct(col("a"), col("b"))).collect()
    }
    val msg = String.valueOf(err.getMessage) + String.valueOf(err.getCause)
    assert(msg.contains("null element"), s"expected the named null-element error, got: $msg")
    // and clean inputs still fold exactly
    val ok = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(graft.functions.VectorExpr.dotProduct(col("a"), col("b")))
      .first().getDouble(0)
    assert(ok == 11.0)
  }
}
