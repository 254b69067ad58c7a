package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class ZOrderSpec extends AnyFunSuite {
  import spark.implicits._

  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zValue matches the reference interleave on exhaustive small inputs") {
    val rows = for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y)
    val out = rows.toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), 4))
      .collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")) -> r.getAs[Long]("z")).toMap
    rows.foreach { case (x, y) =>
      assert(out((x, y)) == morton(x, y, 4), s"($x,$y)")
    }
  }

  test("zValue masks out-of-range values instead of corrupting high bits") {
    val z = Seq((1L << 20, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 4).as("z"))
      .as[Long].head()
    assert(z == morton(0L, 3L, 4)) // 2^20 masked to 0 at 4 bits
  }

  test("sqlZValue is the same arithmetic (replayed through Spark SQL)") {
    val df = Seq((5L, 9L), (1023L, 0L), (7L, 7L)).toDF("x", "y")
    val viaSql = df.selectExpr(s"${ZOrder.sqlZValue("x", "y", 10)} AS z")
      .as[Long].collect().toSeq
    val viaCol = df.select(ZOrder.zValue(col("x"), col("y"), 10).as("z"))
      .as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("clusterBy yields tight per-partition spans on BOTH dimensions") {
    // a 64x64 grid has global span 64 in each dim; after z-clustering
    // into >= 4 partitions, every partition must span far less than the
    // full domain in x AND y (the file-skipping property)
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val parts = ZOrder.clusterBy(grid, "x", "y", 6)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(count(lit(1)).as("n"),
        (max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"))
      .where(col("n") > 1) // AQE may leave empty/singleton partitions
      .collect()
    assert(parts.length >= 2)
    parts.foreach { r =>
      assert(r.getAs[Long]("sx") < 64L && r.getAs[Long]("sy") < 64L,
        s"partition spans whole domain: $r")
    }
    // and the average span must be well under the domain — linear sort
    // by x alone would give sy ≈ 63 everywhere
    val avgSy = parts.map(_.getAs[Long]("sy")).sum.toDouble / parts.length
    assert(avgSy < 48.0, s"avg y-span $avgSy not clustered")
  }
}
