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

  /** Queries deliberately without a SQL oracle — none since round 2
    * (q38's sketch is graded via its error-bound flag). */
  private val rowsOnly = Set.empty[String]

  test("every query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("approx_count_distinct stays within its 2% rsd bound (5% margin)") {
    import org.apache.spark.sql.functions._
    val rows = Engine.table(spark, "/root/testdata/sf0.01", "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("no query output carries array/struct/map columns (driver compare sorts by every column)") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, dir).schema.fields.foreach { f =>
        assert(f.dataType.typeName match {
          case "array" | "struct" | "map" => false
          case _ => true
        }, s"$name column ${f.name} is ${f.dataType.typeName}")
      }
    }
  }
}
