package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class SkewSpec extends AnyFunSuite {
  import spark.implicits._

  test("salted aggregation equals direct aggregation") {
    val df = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i.toLong, i.toDouble))
      .toDF("key", "id", "v")
    val direct = df.groupBy("key")
      .agg(count(lit(1)).as("cnt"), sum($"v").as("total"))
      .orderBy("key").collect()
    val salted = Skew.saltedAgg(df, $"key", $"id", $"v", saltBuckets = 8)
      .orderBy("key").collect()
    assert(direct.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      salted.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("capBlocks bounds rows per block and is deterministic") {
    val df = (1 to 100).map(i => ("giant", i.toLong)).toDF("block", "id")
    val capped = Skew.capBlocks(df, $"block", $"id", maxPerBlock = 30)
    val sizes = capped.groupBy("__capped_block").count()
      .orderBy("__capped_block").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(sizes.toSeq == Seq(("giant#0", 30L), ("giant#1", 30L),
      ("giant#2", 30L), ("giant#3", 10L)))
  }

  test("capBlocks caps a NULL block key instead of nulling it uncapped") {
    // the dirty-data hot key is exactly the block the cap exists for
    val df = (1 to 70).map(i => (None: Option[String], i.toLong)) :+ ((Some("b"), 99L))
    val capped = Skew.capBlocks(df.toDF("block", "id"), $"block", $"id", maxPerBlock = 30)
    val sizes = capped.groupBy("__capped_block").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sizes.keys.forall(_ != null))
    assert(sizes("__null_block__#0") == 30L && sizes("__null_block__#2") == 10L)
    assert(sizes("b#0") == 1L)
  }

  test("capBlocks modes are row-identical (pay-per-use vs mostBlocksOver)") {
    // mixed profile: one over-cap block, one exactly-at-cap, one tiny,
    // one null block — the two physical plans must agree row-for-row
    val rows = (1 to 75).map(i => (Some("hot"), i.toLong)) ++
      (1 to 30).map(i => (Some("edge"), (100 + i).toLong)) ++
      Seq((Some("tiny"), 200L), (None: Option[String], 201L), (None, 202L))
    val df = rows.toDF("block", "id")
    def dump(mode: Boolean) =
      Skew.capBlocks(df, $"block", $"id", maxPerBlock = 30, mostBlocksOver = mode)
        .select("block", "id", "__capped_block").collect()
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getString(2)))
        .sortBy(t => (t._1.getOrElse(""), t._2)).toSeq
    assert(dump(mode = false) == dump(mode = true))
  }

  test("capBlocks rejects reserved columns and non-positive caps") {
    val df = Seq(("g", 1L)).toDF("block", "__rn")
    intercept[IllegalArgumentException] {
      Skew.capBlocks(df, $"block", $"__rn", maxPerBlock = 10)
    }
    intercept[IllegalArgumentException] {
      Skew.capBlocks(Seq(("g", 1L)).toDF("block", "id"), $"block", $"id", 0)
    }
  }
}
