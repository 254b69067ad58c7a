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

  test("every query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
