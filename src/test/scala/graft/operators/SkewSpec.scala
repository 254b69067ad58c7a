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
    def dump(mode: Option[Boolean]) =
      Skew.capBlocks(df, $"block", $"id", maxPerBlock = 30, mostBlocksOver = mode)
        .select("block", "id", "__capped_block").collect()
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getString(2)))
        .sortBy(t => (t._1.getOrElse(""), t._2)).toSeq
    // all THREE selections agree: both explicit profiles and the
    // round-15 auto default (which measures and picks one of them)
    assert(dump(Some(false)) == dump(Some(true)))
    assert(dump(None) == dump(Some(true)))
  }

  test("auto profile selection follows the measured over-cap row fraction") {
    // the pinned rule: one-window engages at >= 50% of rows in
    // over-cap blocks (q95's all-over corpus measured the split at
    // +39%; the LSH safety-valve corpora sit near 0%)
    assert(!Skew.oneWindowWins(totalRows = 100, overRows = 0))
    assert(!Skew.oneWindowWins(totalRows = 100, overRows = 49))
    assert(Skew.oneWindowWins(totalRows = 100, overRows = 50))
    assert(Skew.oneWindowWins(totalRows = 100, overRows = 100))
    assert(!Skew.oneWindowWins(totalRows = 0, overRows = 0))
    // plan-shape witnesses: an all-hot corpus auto-selects the
    // one-window profile (no anti/semi Union), a mostly-cold corpus
    // the pay-per-use split (Union present)
    val hot = (1 to 100).map(i => ("giant", i.toLong)).toDF("block", "id")
    val hotPlan = Skew.capBlocks(hot, $"block", $"id", maxPerBlock = 30)
      .queryExecution.sparkPlan.toString
    assert(!hotPlan.contains("Union"),
      s"all-hot corpus must auto-select one-window (no split):\n$hotPlan")
    val cold = (1 to 100).map(i => (s"b${i % 50}", i.toLong)) ++
      (1 to 40).map(i => ("hot", (1000 + i).toLong))
    val coldPlan = Skew.capBlocks(cold.toDF("block", "id"), $"block", $"id",
        maxPerBlock = 30).queryExecution.sparkPlan.toString
    assert(coldPlan.contains("Union"),
      s"mostly-cold corpus must auto-select the pay-per-use split:\n$coldPlan")
    // same rule, hashed plan: all-hot auto-selects the all-blocks join
    val hotHashed = Skew.capBlocksHashed(hot, $"block", $"id", maxPerBlock = 30)
      .queryExecution.sparkPlan.toString
    assert(!hotHashed.contains("Union"),
      s"all-hot corpus must auto-select the all-blocks hashed join:\n$hotHashed")
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

  test("capBlocks skips the broadcast hint above broadcastKeyLimit (shuffled fallback)") {
    // 5 over-cap blocks, limit 3: the over-cap key set must NOT be
    // broadcast-hinted (a dense corpus under a small cap can push it
    // past the driver/broadcast ceiling) — the planner falls back to
    // shuffled anti/semi joins, and the OUTPUT stays identical to the
    // hinted plan
    val rows = (0 until 5).flatMap(b => (1 to 40).map(i => (s"blk$b", (b * 100 + i).toLong)))
    val df = rows.toDF("block", "id")
    def dump(limit: Long) =
      Skew.capBlocks(df, $"block", $"id", maxPerBlock = 30,
        mostBlocksOver = Some(false), broadcastKeyLimit = limit)
        .select("block", "id", "__capped_block").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(t => (t._1, t._2)).toSeq
    // disable stats-based auto-broadcast: these in-memory fixtures are
    // tiny enough that the planner would broadcast them hint or no
    // hint, masking exactly the guard under test (at the scale the
    // guard exists for, the key set is past any auto threshold too)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      // profile pinned to the split: this all-over-cap fixture would
      // auto-select one-window (no joins at all), masking the guard
      val guarded = Skew.capBlocks(df, $"block", $"id", maxPerBlock = 30,
        mostBlocksOver = Some(false), broadcastKeyLimit = 3)
      val planned = guarded.queryExecution.sparkPlan.toString
      assert(!planned.contains("BroadcastHashJoin"),
        s"over-cap key set must not be broadcast above the limit:\n$planned")
      val hinted = Skew.capBlocks(df, $"block", $"id", maxPerBlock = 30,
        mostBlocksOver = Some(false), broadcastKeyLimit = 5)
        .queryExecution.sparkPlan.toString
      assert(hinted.contains("BroadcastHashJoin"),
        s"within the limit the key set must still broadcast:\n$hinted")
    } finally spark.conf.set(key, prior)
    assert(dump(3) == dump(Skew.DefaultBroadcastKeyLimit))
  }

  test("capBlocks with zero over-cap blocks plans no joins at all") {
    // pay-per-use's designed-for common case: the cap never fires, so
    // the result must be a pure projection — no anti/semi joins, no
    // window (the previous always-built split cost ~11.6% idle
    // overhead, SCALE.md round-8)
    val df = (1 to 50).map(i => (s"b${i % 10}", i.toLong)).toDF("block", "id")
    val capped = Skew.capBlocks(df, $"block", $"id", maxPerBlock = 30)
    val planned = capped.queryExecution.sparkPlan.toString
    assert(!planned.contains("Join") && !planned.contains("Window"),
      s"no-over-cap capBlocks must be join- and window-free:\n$planned")
    val sizes = capped.groupBy("__capped_block").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sizes.keys.forall(_.endsWith("#0")) && sizes.values.sum == 50L)
  }

  test("capBlocksHashed bounds expected sub-block fan-out and keeps every row") {
    // one giant block (200 rows, cap 30 -> ceil = 7 sub-blocks), one
    // under-cap block: fan-out must be exactly ceil(n/cap) POSSIBLE
    // sub-blocks with every assignment in range, rows preserved, and
    // the hash spread must actually use >1 sub-block (the stride-id
    // collapse this mix exists to avoid: ids below are stride-8)
    val rows = (1 to 200).map(i => ("giant", i.toLong * 8)) ++
      (1 to 10).map(i => ("small", (10000 + i).toLong))
    val df = rows.toDF("block", "id")
    val capped = Skew.capBlocksHashed(df, $"block", $"id", maxPerBlock = 30)
    val out = capped.select("block", "id", "__capped_block").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.length == 210 && out.map(t => (t._1, t._2)).toSet == rows.toSet)
    val giantSubs = out.filter(_._1 == "giant").map(_._3).distinct
    assert(giantSubs.forall { s =>
      val i = s.stripPrefix("giant#").toInt; i >= 0 && i < 7
    }, s"sub-block index out of [0,7): ${giantSubs.mkString(",")}")
    assert(giantSubs.length >= 5,
      s"stride-8 ids collapsed to ${giantSubs.length} of 7 sub-blocks — hash mix degenerated")
    assert(out.filter(_._1 == "small").map(_._3).distinct.toSeq == Seq("small#0"))
    // deterministic: a second plan assigns identically
    val again = Skew.capBlocksHashed(df, $"block", $"id", maxPerBlock = 30)
      .select("block", "id", "__capped_block").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(again.sortBy(t => (t._1, t._2)).toSeq == out.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("capBlocksHashed plans no sort and no window") {
    // the profile's whole point: an over-cap block must not serialize
    // a rank-window sort onto one task
    val df = (1 to 100).map(i => ("giant", i.toLong)).toDF("block", "id")
    val planned = Skew.capBlocksHashed(df, $"block", $"id", maxPerBlock = 30)
      .queryExecution.sparkPlan.toString
    assert(!planned.contains("Window") && !planned.contains("Sort"),
      s"hashed sub-blocking must be sort-free:\n$planned")
  }

  test("capBlocksHashed caps a NULL block and rejects non-integral order columns") {
    val withNull = ((1 to 70).map(i => (None: Option[String], i.toLong)) :+
      ((Some("b"), 99L))).toDF("block", "id")
    val sizes = Skew.capBlocksHashed(withNull, $"block", $"id", maxPerBlock = 30)
      .groupBy("__capped_block").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(sizes.forall(_._1 != null))
    assert(sizes.filter(_._1.startsWith("__null_block__#")).map(_._2).sum == 70L)
    val strings = Seq(("g", "x")).toDF("block", "id")
    val err = intercept[IllegalArgumentException] {
      Skew.capBlocksHashed(strings, $"block", $"id", maxPerBlock = 10)
    }
    assert(err.getMessage.contains("integral"))
  }

  test("capBlocksHashed modes are row-identical (pay-per-use vs mostBlocksOver)") {
    // mixed profile on purpose: over-cap, exactly-at-cap, tiny, and
    // null blocks — the all-blocks-joined plan must reproduce the
    // split plan's assignment everywhere, including the under-cap
    // blocks it routes through the hash arithmetic (nSub = 1 -> "#0")
    val rows = (1 to 75).map(i => (Some("hot"), i.toLong * 8)) ++
      (1 to 30).map(i => (Some("edge"), (1000 + i).toLong)) ++
      Seq((Some("tiny"), 2000L), (None: Option[String], 2001L), (None, 2002L))
    val df = rows.toDF("block", "id")
    def dump(mode: Option[Boolean]) =
      Skew.capBlocksHashed(df, $"block", $"id", maxPerBlock = 30, mostBlocksOver = mode)
        .select("block", "id", "__capped_block").collect()
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getString(2)))
        .sortBy(t => (t._1.getOrElse(""), t._2)).toSeq
    assert(dump(Some(false)) == dump(Some(true)))
    assert(dump(None) == dump(Some(true)))
  }

  test("capBlocksHashed mostBlocksOver plans one join and no union/sort/window") {
    // the profile's point: no anti/semi split (three scans + a union)
    // when the caller knows most blocks exceed the cap — just counts
    // joined on. Still sort-free like the split plan.
    val df = (1 to 100).map(i => ("giant", i.toLong)).toDF("block", "id")
    val planned = Skew.capBlocksHashed(df, $"block", $"id", maxPerBlock = 30,
      mostBlocksOver = Some(true)).queryExecution.sparkPlan.toString
    assert(!planned.contains("Union") && !planned.contains("Window") &&
      !planned.contains("Sort"),
      s"mostBlocksOver hashed plan must be split-free and sort-free:\n$planned")
    assert(planned.contains("Join"), s"counts must join onto the rows:\n$planned")
  }

  test("capBlocksHashed keeps null-id rows and folds negative ids like the oracle") {
    // null ids: concat is null-intolerant — an unfolded null id would
    // null __capped_block and silently drop the row from every
    // non-null-safe consumer downstream (rank mode keeps null-id rows,
    // so hashed mode must too; they fold to id 0). Negative ids: the
    // operator folds via pmod and the portable replay is the sign-safe
    // ((x % m) + m) % m on both engines — pinned here against a local
    // replay of the documented formula, because the xxhash64 pre-hash
    // the operator's own error message recommends is negative for half
    // of all inputs.
    val rows = (1 to 60).map(i => ("giant", Some((i - 30).toLong * 7919))) ++
      Seq(("giant", None), ("giant", None))
    val df = rows.toDF("block", "id")
    val out = Skew.capBlocksHashed(df, $"block", $"id", maxPerBlock = 20)
      .select("id", "__capped_block").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1)))
    assert(out.length == 62 && out.forall(_._2 != null),
      "null/negative ids must keep rows with non-null capped blocks")
    val nSub = (62 - 1) / 20 + 1
    def replay(id: Long): Long = {
      val m = 2147483648L
      val folded = ((id % m) + m) % m
      (((folded * 2654435761L) % 4294967296L) * nSub) / 4294967296L
    }
    out.foreach { case (id, cb) =>
      val want = s"giant#${replay(id.getOrElse(0L))}"
      assert(cb == want, s"id=$id assigned $cb, portable replay says $want")
    }
  }
}
