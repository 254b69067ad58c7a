package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class TopKAggSpec extends AnyFunSuite {
  import spark.implicits._

  private def ranked(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopKAgg.topK(col("s"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"),
        col("col").getField("score").as("s"), col("col").getField("id").as("id"))

  test("matches the window top-k exactly, including ties, across partitions") {
    // 4 groups x 500 rows with deliberate score ties, spread over many
    // partitions so partial/merge paths genuinely run
    val rows = for (g <- 0 until 4; i <- 0 until 500)
      yield (s"g$g", (i % 37).toDouble, (g * 1000 + i).toLong)
    val df = rows.toDF("g", "s", "id").repartition(13)
    val viaAgg = ranked(df, 5).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("pos"),
        r.getAs[Double]("s"), r.getAs[Long]("id"))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("s").desc, col("id"))
    val viaWin = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select(col("g"), (col("rn") - 1).as("pos"), col("s"), col("id")).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("pos"),
        r.getAs[Double]("s"), r.getAs[Long]("id"))).toSet
    assert(viaAgg == viaWin)
  }

  test("groups smaller than k return all rows, best first") {
    val df = Seq(("a", 1.0, 1L), ("a", 9.0, 2L)).toDF("g", "s", "id")
    val out = ranked(df, 10).orderBy("pos").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("s") == 9.0 && out(1).getAs[Double]("s") == 1.0)
  }

  test("null scores and ids are skipped, not ranked") {
    val df = Seq(
      (Some("a"), Some(5.0), Some(1L)), (Some("a"), None, Some(2L)),
      (Some("a"), Some(7.0), None)).map { case (g, s, i) => (g.get, s, i) }
      .toDF("g", "s", "id")
    val out = ranked(df, 3).collect()
    assert(out.length == 1 && out.head.getAs[Long]("id") == 1L)
  }

  test("plan aggregates partially before the exchange (map-side top-k)") {
    val df = (0 until 100).map(i => (s"g${i % 3}", i.toDouble, i.toLong))
      .toDF("g", "s", "id").repartition(7)
    val p = df.groupBy("g").agg(TopKAgg.topK(col("s"), col("id"), 3).as("t"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate (TypedImperativeAggregate's operator) must
    // appear in partial AND final mode around the shuffle
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_top_k_pairs") || p.contains("top_k_pairs"), p)
  }
}
