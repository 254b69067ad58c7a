package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class ExtensionsSpec extends AnyFunSuite {
  import spark.implicits._

  // parquet-backed: a LocalRelation would be folded away by
  // ConvertToLocalRelation before the rule could be observed
  private lazy val df = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ext").toString
    Seq(
      (Some("kitten"), Some("sitting")), // lev 3
      (Some("abc"), Some("abd")), // lev 1
      (Some("abc"), Some("abc")), // lev 0
      (Some("a"), Some("abcdefgh")), // length gap 7 — prefilter kills it
      (None, Some("abc")), (Some("abc"), None), (None, None))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("lev <= k rewrites to length guard + thresholded levenshtein") {
    val q = df.where(levenshtein($"a", $"b") <= 1)
    val p = q.queryExecution.optimizedPlan.toString
    assert(p.contains("Some(1)"), s"expected thresholded levenshtein in:\n$p")
    assert(p.contains("abs((length"), s"expected length-difference guard in:\n$p")
  }

  test("rewritten filter keeps exact semantics (matches, misses, nulls)") {
    val got = df.where(levenshtein($"a", $"b") <= 1)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b"))).toSet
    assert(got == Set(("abc", "abd"), ("abc", "abc")))
    // strict form k-1
    val lt = df.where(levenshtein($"a", $"b") < 1)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b"))).toSet
    assert(lt == Set(("abc", "abc")))
  }

  test("long-cast comparison form (the q89 shape) also rewrites and agrees") {
    val q = df.withColumn("lev", levenshtein($"a", $"b").cast("long"))
      .where($"lev" <= 1L)
    val p = q.queryExecution.optimizedPlan.toString
    assert(p.contains("Some(1)"), s"expected thresholded levenshtein in:\n$p")
    assert(q.count() == 2)
  }

  test("unthresholded levenshtein VALUES are untouched (projection only)") {
    val vals = df.where($"a".isNotNull && $"b".isNotNull)
      .select(levenshtein($"a", $"b").as("d")).as[Int].collect().sorted.toSeq
    assert(vals == Seq(0, 1, 3, 7))
  }
}
