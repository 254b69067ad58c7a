package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class RangeJoinSpec extends AnyFunSuite {
  import spark.implicits._

  private def points = Seq((1L, 0L), (1L, 10L), (1L, 11L), (1L, 25L), (2L, 10L))
    .toDF("k", "v")
  private def intervals = Seq((1L, 0L, 10L), (1L, 20L, 30L), (2L, 50L, 60L))
    .toDF("k", "lo", "hi")

  test("inclusive bounds and bucket boundaries") {
    // bandWidth 4 puts lo/hi on and off bucket edges
    val got = RangeJoin.banded(points, intervals, "v", "lo", "hi", 4L, Seq("k"))
      .select("k", "v", "lo").as[(Long, Long, Long)].collect().toSet
    // v=0 and v=10 inclusive in [0,10]; v=11 out; v=25 in [20,30];
    // user 2's point 10 not in [50,60]
    assert(got == Set((1L, 0L, 0L), (1L, 10L, 0L), (1L, 25L, 20L)))
  }

  test("pure band join (no equi keys) with disjoint column names") {
    val p = Seq(5L, 15L).toDF("v")
    val i = Seq((0L, 9L, "a"), (10L, 19L, "b")).toDF("lo", "hi", "tag")
    val got = RangeJoin.banded(p, i, "v", "lo", "hi", 3L)
      .select("v", "tag").as[(Long, String)].collect().toSet
    assert(got == Set((5L, "a"), (15L, "b")))
  }

  test("empty intervals (hi < lo) match nothing") {
    val i = Seq((1L, 30L, 20L)).toDF("k", "lo", "hi")
    assert(RangeJoin.banded(points, i, "v", "lo", "hi", 4L, Seq("k")).count() == 0)
  }

  test("oversized interval fails fast instead of exploding") {
    val i = Seq((1L, 0L, Long.MaxValue / 2)).toDF("k", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.banded(points, i, "v", "lo", "hi", 4L, Seq("k"),
        maxBandsPerInterval = 1000).count()
    }
    assert(ex.getMessage != null)
  }

  test("column-collision preconditions are enforced") {
    val clash = intervals.withColumnRenamed("lo", "v") // shares non-key 'v'
    intercept[IllegalArgumentException] {
      RangeJoin.banded(points, clash, "v", "v", "hi", 4L, Seq("k"))
    }
  }
}
