package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class EntrySpec extends AnyFunSuite {

  test("flagship entry returns rows on sf0.001") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.head.schema.fieldNames.toSeq ==
      Seq("lang", "word", "n", "rank"))
  }

  /** Queries deliberately without a SQL oracle (sketch internals differ
    * across engines) — everything else must have one. */
  private val rowsOnly = Set("q38_approx_distinct")

  test("every query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("approx_count_distinct stays within its 2% rsd bound (5% margin)") {
    val rows = SparkEntry.queries("q38_approx_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      val approx = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }
}
