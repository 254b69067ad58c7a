package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class StatsSpec extends AnyFunSuite {
  import spark.implicits._

  // ---- SCD2 -------------------------------------------------------------

  test("scd2 collapses runs into intervals with open current version") {
    val ev = Seq(
      (1L, 10L, 101L, "A"), (1L, 20L, 102L, "A"), (1L, 30L, 103L, "B"),
      (1L, 40L, 104L, "A"),
      (2L, 15L, 201L, "X"))
      .toDF("ent", "ts", "k", "attr")
    val out = Scd2.history(ev, "ent", "ts", "k", "attr")
      .orderBy("ent", "valid_from").collect()
    // entity 1: A[10,30) B[30,40) A[40,null); entity 2: X[15,null)
    assert(out.length == 4)
    val e1 = out.filter(_.getAs[Long]("ent") == 1L)
    assert(e1.map(_.getAs[String]("attr")).toSeq == Seq("A", "B", "A"))
    assert(e1.map(_.getAs[Long]("valid_from")).toSeq == Seq(10L, 30L, 40L))
    assert(e1(0).getAs[Long]("valid_to") == 30L && e1(1).getAs[Long]("valid_to") == 40L)
    assert(e1(2).isNullAt(e1(2).fieldIndex("valid_to")) && e1(2).getAs[Long]("is_current") == 1L)
    val e2 = out.filter(_.getAs[Long]("ent") == 2L).head
    assert(e2.getAs[String]("attr") == "X" && e2.getAs[Long]("is_current") == 1L)
  }

  test("scd2 tracks transitions into and out of null attribute values") {
    val ev = Seq(
      (1L, 10L, 1L, Some("A")), (1L, 20L, 2L, None),
      (1L, 30L, 3L, Some("A")), (2L, 5L, 4L, None))
      .toDF("ent", "ts", "k", "attr")
    val out = Scd2.history(ev, "ent", "ts", "k", "attr")
      .orderBy("ent", "valid_from").collect()
    // entity 1: A[10,20) null[20,30) A[30,null); entity 2: null[5,null)
    assert(out.length == 4)
    val e1 = out.filter(_.getAs[Long]("ent") == 1L)
    assert(e1.map(r => Option(r.getAs[String]("attr"))).toSeq ==
      Seq(Some("A"), None, Some("A")))
    assert(e1(0).getAs[Long]("valid_to") == 20L && e1(1).getAs[Long]("valid_to") == 30L)
    val e2 = out.filter(_.getAs[Long]("ent") == 2L).head
    assert(e2.isNullAt(e2.fieldIndex("attr")) && e2.getAs[Long]("is_current") == 1L)
  }

  test("scd2 same-timestamp changes are ordered by the tiebreak column") {
    val ev = Seq((1L, 10L, 1L, "A"), (1L, 10L, 2L, "B"), (1L, 10L, 3L, "B"))
      .toDF("ent", "ts", "k", "attr")
    val out = Scd2.history(ev, "ent", "ts", "k", "attr")
      .orderBy("valid_from", "attr").collect()
    assert(out.map(_.getAs[String]("attr")).toSeq == Seq("A", "B"))
    assert(out(1).getAs[Long]("is_current") == 1L)
  }

  test("scd2 mergeHistory equals full recompute; untouched entities pass through") {
    val prior = Seq(
      (1L, 10L, 101L, "A"), (1L, 20L, 102L, "B"), // entity 1: A then B
      (2L, 15L, 201L, "X")) // entity 2: untouched by the batch
      .toDF("ent", "ts", "k", "attr")
    val batch = Seq((1L, 30L, 103L, "A"), (3L, 40L, 301L, "Z")) // extend 1, new 3
      .toDF("ent", "ts", "k", "attr")
    val merged = Scd2.mergeHistory(
      Scd2.historyKeepTie(prior, "ent", "ts", "k", "attr"),
      batch, "ent", "ts", "k", "attr")
    val full = Scd2.history(prior.unionByName(batch), "ent", "ts", "k", "attr")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("ent"), r.getAs[String]("attr"), r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")), r.getAs[Long]("is_current"))
    assert(merged.collect().map(key).toSet == full.collect().map(key).toSet)
    // entity 2's open version survived untouched; entity 1 grew a third
    // version; entity 3 appeared
    val m = merged.collect().map(key).toSet
    assert(m.contains((2L, "X", 15L, None, 1L)))
    assert(m.contains((1L, "A", 30L, None, 1L)))
    assert(m.contains((3L, "Z", 40L, None, 1L)))
  }

  test("scd2 appendOnlyViolations flags out-of-order batch rows, passes clean batches") {
    val prior = Scd2.historyKeepTie(
      Seq((1L, 10L, 101L, "A"), (1L, 20L, 102L, "B"), (2L, 15L, 201L, "X"))
        .toDF("ent", "ts", "k", "attr"),
      "ent", "ts", "k", "attr")
    // clean: strictly after each entity's max prior (ts, tie)
    val clean = Seq((1L, 30L, 103L, "A"), (2L, 20L, 103L, "Y"), (3L, 1L, 1L, "Z"))
      .toDF("ent", "ts", "k", "attr")
    assert(Scd2.appendOnlyViolations(prior, clean, "ent", "ts", "k").isEmpty)
    // dirty: ts before entity 1's last version open (20), equal-(ts,tie)
    // replay of entity 2's latest, plus one clean row that must NOT flag
    val dirty = Seq((1L, 15L, 999L, "C"), (2L, 15L, 201L, "X"), (2L, 16L, 1L, "Y"))
      .toDF("ent", "ts", "k", "attr")
    val bad = Scd2.appendOnlyViolations(prior, dirty, "ent", "ts", "k")
      .select("ent", "ts").as[(Long, Long)].collect().toSet
    assert(bad == Set((1L, 15L), (2L, 15L)))
  }

  test("scd2 mergeHistoryKeepTie is closed under iteration (fold two batches)") {
    val prior = Seq((1L, 10L, 1L, "A")).toDF("ent", "ts", "k", "attr")
    val b1 = Seq((1L, 20L, 2L, "B")).toDF("ent", "ts", "k", "attr")
    val b2 = Seq((1L, 30L, 3L, "A"), (2L, 5L, 4L, "X")).toDF("ent", "ts", "k", "attr")
    val fold1 = Scd2.mergeHistoryKeepTie(
      Scd2.historyKeepTie(prior, "ent", "ts", "k", "attr"), b1, "ent", "ts", "k", "attr")
    val fold2 = Scd2.mergeHistoryKeepTie(fold1, b2, "ent", "ts", "k", "attr")
    val full = Scd2.historyKeepTie(prior.unionByName(b1).unionByName(b2),
      "ent", "ts", "k", "attr")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("ent"), r.getAs[String]("attr"), r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")))
    assert(fold2.collect().map(key).toSet == full.collect().map(key).toSet)
  }

  test("scd2 mergeHistory handles null entity keys like full recompute") {
    val prior = Seq((Option.empty[java.lang.Long], 10L, 1L, "A"))
      .toDF("ent", "ts", "k", "attr")
    val batch = Seq((Option.empty[java.lang.Long], 20L, 2L, "B"))
      .toDF("ent", "ts", "k", "attr")
    val merged = Scd2.mergeHistory(
      Scd2.historyKeepTie(prior, "ent", "ts", "k", "attr"),
      batch, "ent", "ts", "k", "attr").orderBy("valid_from").collect()
    // null key is ONE entity: A[10,20) closed, B[20,null) open
    assert(merged.length == 2)
    assert(merged(0).getAs[String]("attr") == "A" && merged(0).getAs[Long]("valid_to") == 20L)
    assert(merged(1).getAs[String]("attr") == "B" && merged(1).getAs[Long]("is_current") == 1L)
  }

  test("scd2 mergeHistory batch continuing the open version does not split it") {
    val prior = Seq((1L, 10L, 1L, "A")).toDF("ent", "ts", "k", "attr")
    val batch = Seq((1L, 20L, 2L, "A")).toDF("ent", "ts", "k", "attr") // same attr
    val merged = Scd2.mergeHistory(
      Scd2.historyKeepTie(prior, "ent", "ts", "k", "attr"),
      batch, "ent", "ts", "k", "attr").collect()
    assert(merged.length == 1) // still one open A version from ts=10
    assert(merged.head.getAs[Long]("valid_from") == 10L)
    assert(merged.head.getAs[Long]("is_current") == 1L)
  }

  // ---- grouped regression ----------------------------------------------

  test("grouped regression recovers an exact linear relationship") {
    // y = 3x + 7 exactly → slope 3, intercept 7, r2 1
    val df = (1 to 50).map(i => ("g", i.toDouble, 3.0 * i + 7.0)).toDF("g", "x", "y")
    val r = Stats.groupedRegression(df, "g", "x", "y").head()
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 7.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
    assert(r.getAs[Long]("n") == 50L)
  }

  test("grouped regression matches the closed form on noisy data per group") {
    val data = Seq(("a", 1.0, 2.0), ("a", 2.0, 2.5), ("a", 3.0, 4.5), ("a", 4.0, 4.0),
      ("b", 1.0, 10.0), ("b", 2.0, 8.0), ("b", 3.0, 7.0))
    val byG = data.groupBy(_._1)
    val r = Stats.groupedRegression(data.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(row => row.getAs[String]("g") -> row).toMap
    for ((g, rows) <- byG) {
      val xs = rows.map(_._2); val ys = rows.map(_._3); val n = xs.size
      val mx = xs.sum / n; val my = ys.sum / n
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / n
      val vx = xs.map(x => (x - mx) * (x - mx)).sum / n
      assert(math.abs(r(g).getAs[Double]("slope") - cov / vx) < 1e-9, s"slope $g")
      assert(math.abs(r(g).getAs[Double]("intercept") - (my - cov / vx * mx)) < 1e-9)
    }
  }

  test("grouped regression restricts slope/intercept to complete (x,y) pairs") {
    // (3, null) must not pollute var_pop/avg: over the complete pairs
    // y = x exactly, so slope 1 / intercept 0 (mixing subsets gives 0.375)
    val df = Seq(("g", Some(1.0), Some(1.0)), ("g", Some(2.0), Some(2.0)),
      ("g", Some(3.0), None)).toDF("g", "x", "y")
    val r = Stats.groupedRegression(df, "g", "x", "y").head()
    assert(math.abs(r.getAs[Double]("slope") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept")) < 1e-9)
    assert(r.getAs[Long]("n") == 3L) // n stays the group row count
  }

  // ---- robust outliers --------------------------------------------------

  test("robust outliers: special value-column names resolve as columns, not expressions") {
    // "a-b" inside a spliced SQL string would parse as subtraction
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("g", "a-b")
    val r = Stats.robustOutliers(df, "g", "a-b", 3.0).head()
    assert(math.abs(r.getAs[Double]("med") - 2.0) < 1e-12)
  }

  test("robustZ classifies mad=0 groups like robustOutliers' multiply form") {
    // >50% identical values → mad 0; deviating rows must score Infinity
    // (outliers), identical rows 0 — not divide-by-zero NULL
    val df = Seq(5.0, 5.0, 5.0, 9.0).map(("g", _)).toDF("g", "v")
    val out = Stats.robustOutliers(df, "g", "v", 3.0).head()
    assert(out.getAs[Double]("mad") == 0.0 && out.getAs[Long]("n_outliers") == 1L)
    val z = df.select(Stats.robustZ($"v", lit(5.0), lit(0.0)).as("z"))
      .collect().map(_.getDouble(0)).toSeq
    assert(z.count(_ == 0.0) == 3 && z.count(_.isPosInfinity) == 1)
  }

  test("robust outliers: median/MAD ignore the outlier, then flag it") {
    // 9 values near 10 plus one wild point; mean-based z would be dragged,
    // median/MAD is not
    val vals = Seq(9.0, 9.5, 10.0, 10.0, 10.0, 10.5, 10.5, 11.0, 9.5, 1000.0)
    val df = vals.map(("t", _)).toDF("g", "v")
    val r = Stats.robustOutliers(df, "g", "v", 3.0).head()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("n_outliers") == 1L)
    assert(math.abs(r.getAs[Double]("med") - 10.0) < 1e-12)
  }

  test("robust outliers: clean uniform group has none") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = Stats.robustOutliers(df, "g", "v", 3.0).head()
    assert(r.getAs[Long]("n_outliers") == 0L)
  }

  // ---- histogram ---------------------------------------------------------

  test("intHistogram: bins cover the domain, counts sum to n, max in last bin") {
    val df = (0L to 99L).toDF("v")
    val rows = Stats.intHistogram(df, "v", 10).orderBy("bin").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("cnt")).sum == 100L)
    assert(rows.head.getAs[Long]("lo") == 0L)
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (0L to 9L))
    // width = floor(99/10)+1 = 10 → each bin exactly 10
    assert(rows.forall(_.getAs[Long]("cnt") == 10L))
  }

  test("intHistogram excludes nulls instead of emitting a phantom null bin") {
    val df = Seq(Some(1L), Some(2L), None, Some(3L)).toDF("v")
    val rows = Stats.intHistogram(df, "v", 2).collect()
    assert(rows.map(_.getAs[Long]("cnt")).sum == 3L)
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("bin"))))
  }

  test("intHistogram handles skewed data without empty-domain bins leaking") {
    val df = (Seq.fill(95)(5L) ++ Seq(100L, 101L, 102L, 103L, 200L)).toDF("v")
    val rows = Stats.intHistogram(df, "v", 4).collect()
    assert(rows.map(_.getAs[Long]("cnt")).sum == 100L)
    // every value within its bin bounds
    rows.foreach { r =>
      assert(r.getAs[Long]("lo") <= r.getAs[Long]("hi"))
    }
  }
}
