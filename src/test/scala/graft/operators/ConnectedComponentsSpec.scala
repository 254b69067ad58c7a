package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** Connected components over pair graphs — adversarial shapes: a long
  * path (worst case for label propagation depth), a star, two disjoint
  * components, reversed/unordered ids, and a dense clique. Expected
  * labels computed with a plain union-find in the test. */
class ConnectedComponentsSpec extends AnyFunSuite {
  import spark.implicits._

  private def expected(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { // iterative: chains deeper than the stack
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  private def check(edges: Seq[(Long, Long)], alsoLooped: Boolean = false): Unit = {
    val df = edges.toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected(edges), s"edges=$edges")
    if (alsoLooped) {
      // a tiny driver-finish cap forces the DISTRIBUTED multi-round
      // contraction loop (otherwise untested: real caps finish round 0);
      // exercised on the worst-case shapes only — each round costs
      // several materialization jobs
      val gotLooped = Dedup.connectedComponents(df, driverFinishMaxEdges = 2L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotLooped == expected(edges), s"looped path differs, edges=$edges")
    }
  }

  test("long path converges to the minimum endpoint") {
    check((0L until 99L).map(i => (i, i + 1)), alsoLooped = true)
    // reversed path with the min at the far end
    check((0L until 99L).map(i => (100L - i, 99L - i)))
  }

  test("star, clique, two components, single edge") {
    check(Seq((5L, 1L), (5L, 9L), (5L, 7L), (5L, 3L)))
    // looped: a clique contracts to ZERO residual edges in round 0 —
    // the empty-remap branch of the distributed finish
    check(for { a <- 10L to 14L; b <- 10L to 14L if a < b } yield (a, b),
      alsoLooped = true)
    check(Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)))
    check(Seq((42L, 7L)))
  }

  test("bridged stars: two dense hubs joined by one edge") {
    val star1 = (1L to 20L).map(i => (0L, i))
    val star2 = (101L to 120L).map(i => (100L, i))
    check(star1 ++ star2 :+ (20L -> 120L), alsoLooped = true)
  }

  test("nearDedup keeps exactly one survivor per duplicate cluster") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),        // dup of 1
      (3L, "alpha beta gamma delta epsilon eta"),          // near-dup of 1
      (10L, "totally different content about spark engines"),
      (11L, "unrelated text mentioning neither cluster"))
      .toDF("doc_id", "text")
    val kept = Dedup.nearDedup(docs, "doc_id", "text", threshold = 0.6)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 10L, 11L),
      s"cluster {1,2,3} must keep only min id 1; got ${kept.mkString(",")}")
  }

  test("mergeClusters folds new pairs into standing assignments batch-sized") {
    // prior state: {1,2,3}->1, {10,11}->10, {20}->20
    val prior = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (20L, 20L))
      .toDF("id", "cluster_id")
    // new batch: 30 joins cluster 1 (via 3); 11-20 merges two prior
    // clusters; 40-41 is a brand-new cluster
    val pairs = Seq((3L, 30L), (11L, 20L), (40L, 41L)).toDF("id_a", "id_b")
    val merged = Dedup.mergeClusters(prior, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 30L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 10L,
      40L -> 40L, 41L -> 40L))
    // equivalence: identical to re-clustering from scratch over the
    // prior assignment re-expressed as edges plus the new pairs
    val allEdges = prior.where($"id" =!= $"cluster_id")
      .select($"id".as("id_a"), $"cluster_id".as("id_b"))
      .unionByName(pairs)
      .unionByName(Seq((20L, 20L)).toDF("id_a", "id_b")) // singleton must still appear
    val full = Dedup.connectedComponents(allEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == full)
  }

  test("string ids fail fast with a clear message, not mid-job") {
    val pairs = Seq(("a", "b"), ("b", "c")).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs)
    }
    assert(e.getMessage.contains("integral id columns"))
  }

  test("a malformed GRAFT_CC_DRIVER_MAX_EDGES override names itself") {
    // round-7 ADVICE fix, pinned: a bare .toLong surfaced '8m' as
    // ExceptionInInitializerError on ANY Dedup use, hiding the cause
    val e = intercept[IllegalArgumentException] {
      Dedup.parseEdgeCapOverride("8m")
    }
    assert(e.getMessage.contains("GRAFT_CC_DRIVER_MAX_EDGES") &&
      e.getMessage.contains("8m"))
    assert(Dedup.parseEdgeCapOverride(" 3000000 ") == 3000000L)
  }

  test("packed-collect length guard sums as Long and names the array limit") {
    // round-7 ADVICE fix, pinned via the seam (the real failure needs
    // >16 GB of edges): an Int sum of chunk lengths wraps negative past
    // ~1.07G packed longs and the alloc would throw
    // NegativeArraySizeException; the guard must instead sum as Long
    // and raise the NAMED error, with the bound at HotSpot's real
    // array ceiling (Int.MaxValue - 8), not Int.MaxValue
    assert(Dedup.packedTotalLongs(Iterator(5, 7)) == 12)
    assert(Dedup.packedTotalLongs(Iterator(Int.MaxValue - 10, 2)) == Int.MaxValue - 8)
    val overflowing = Iterator(Int.MaxValue, Int.MaxValue, Int.MaxValue)
    val e = intercept[IllegalArgumentException] {
      Dedup.packedTotalLongs(overflowing)
    }
    assert(e.getMessage.contains("JVM array limit") &&
      e.getMessage.contains((3L * Int.MaxValue).toString))
    intercept[IllegalArgumentException] {
      Dedup.packedTotalLongs(Iterator(Int.MaxValue - 9, 2)) // the HotSpot gap
    }
  }

  test("bandBucketSizes spreads the signature scan before the banding explode") {
    // round-7 ADVICE fix, pinned: on a single-file corpus the
    // explode/partial-agg map side otherwise runs on ONE core (the
    // CLAUDE.md single-split rule) — Engine.spread's round-robin
    // exchange must sit in the plan
    val docs = graft.Engine.table(spark, "/root/testdata/sf0.001", "documents")
    val p = Dedup.bandBucketSizes(docs, "doc_id", "text", 16, 4)
      .queryExecution.sparkPlan.toString
    assert(p.toLowerCase.contains("roundrobin"),
      s"bandBucketSizes lost its Engine.spread round-robin exchange:\n$p")
  }
}
