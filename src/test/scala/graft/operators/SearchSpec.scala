package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class SearchSpec extends AnyFunSuite {
  import spark.implicits._

  // ---- BM25 -------------------------------------------------------------

  private val corpus = Seq(
    (1L, "spark shuffle merge sort merge"),
    (2L, "window batch window window stream"),
    (3L, "merge merge merge merge merge merge merge merge"),
    (4L, "totally unrelated words about nothing at all"),
    (5L, "sort batch merge window sort"))
    .toDF("doc_id", "text")

  test("bm25: docs without any query term get no row") {
    val scores = Retrieval.bm25Scores(corpus, "doc_id", "text", Seq("merge", "window"))
    val ids = scores.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 5L))
  }

  test("bm25 matches hand-computed score on a tiny corpus") {
    // doc 1, terms merge(tf=2)+window(0) among 5 docs, dl=5
    // df(merge)=3 → idf = ln(1 + (5-3+0.5)/(3+0.5)) = ln(1+2.5/3.5)
    // avgdl = (5+5+8+7+5)/5 = 6.0
    // w = idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
    val k1 = 1.2; val b = 0.75
    val idf = math.log(1.0 + 2.5 / 3.5)
    val expected = idf * 2.0 * (k1 + 1.0) / (2.0 + k1 * (1.0 - b + b * 5.0 / 6.0))
    val got = Retrieval.bm25Scores(corpus, "doc_id", "text", Seq("merge", "window"), k1, b)
      .where($"doc_id" === 1L).select("score").as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
  }

  test("bm25 tf saturation: 8x repetition does not score 8x") {
    val s = Retrieval.bm25Scores(corpus, "doc_id", "text", Seq("merge"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(s(3L) > s(1L)) // more occurrences still rank higher...
    assert(s(3L) < 4.0 * s(1L)) // ...but nowhere near linearly
  }

  test("bm25TopK is rank-ordered with doc_id tiebreak and capped at k") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("merge", "window"), 3)
      .collect()
    assert(top.length == 3)
    val scores = top.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_)))
  }

  // ---- Bloom join -------------------------------------------------------

  test("bloom filter has no false negatives and prunes most non-members") {
    val build = (0L until 500L).map(i => i * 7L).toDF("k")
    val filter = BloomJoin.buildBits(build, "k", 1 << 14, 4)
    val probe = (0L until 10000L).toDF("k")
    val kept = BloomJoin.pruned(probe, "k", filter).as[Long].collect().toSet
    val members = (0L until 500L).map(_ * 7L).filter(_ < 10000L).toSet
    assert(members.subsetOf(kept), "bloom filter dropped a true member")
    // 10k probes, ~1429 members; fp rate at m=16384,n=500,k=4 is ~0.1%
    assert(kept.size < members.size + 100, s"too many false positives: ${kept.size}")
  }

  test("sizedBits: next pow2 >= 10 bits/key, floored at a word, capped at 2^27") {
    assert(BloomJoin.sizedBits(0) == 64)
    assert(BloomJoin.sizedBits(6) == 64) // 60 bits -> one word floor
    assert(BloomJoin.sizedBits(7) == 128) // 70 bits -> 128
    assert(BloomJoin.sizedBits(1638) == 16384) // 16380 -> 2^14
    assert(BloomJoin.sizedBits(30000) == 1 << 19) // 300k bits -> 2^19: ~10b/key
    assert(BloomJoin.sizedBits(1L << 40) == 1 << 27) // cap
    assert(BloomJoin.sizedBits(1024, bitsPerKey = 16) == 16384) // exact pow2
  }

  test("bloom-pruned join equals plain join exactly") {
    val build = Seq(3L, 9L, 12L, 77L).toDF("k")
    val probe = (0L until 200L).map(i => (i, s"v$i")).toDF("k", "v")
    val filter = BloomJoin.buildBits(build, "k", 1 << 10, 4)
    val prunedJoin = build.join(BloomJoin.pruned(probe, "k", filter), "k")
    val plainJoin = build.join(probe, "k")
    assert(prunedJoin.orderBy("k").collect().toSeq ==
      plainJoin.orderBy("k").collect().toSeq)
  }

  test("bloom filter absorbs int/long key-width drift; rejects type mismatch") {
    // xxhash64 tags the input type: INT 1 and BIGINT 1 hash differently,
    // so without canonicalization a width drift (which TableContractSpec
    // deliberately permits) would produce silent false negatives.
    val build = Seq(3, 9, 12).toDF("k") // int keys
    val filter = BloomJoin.buildBits(build, "k", 1 << 10, 4)
    val probeLong = Seq(3L, 9L, 12L, 100L).toDF("k") // long keys
    val kept = BloomJoin.pruned(probeLong, "k", filter).as[Long].collect().toSet
    assert(Set(3L, 9L, 12L).subsetOf(kept), "width drift dropped a true member")
    val err = intercept[IllegalArgumentException] {
      BloomJoin.pruned(Seq("3").toDF("k"), "k", filter)
    }
    assert(err.getMessage.contains("canonicalizes"))
  }

  // ---- Triangle counting ------------------------------------------------

  test("triangle counts: K4 has 3 per node, path/star have none") {
    // K4 on {1,2,3,4}: every node is in C(3,2)=3 triangles
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val out = Graph.triangleCounts(k4).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("triangles")).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))

    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    assert(Graph.triangleCounts(star).isEmpty)
  }

  test("triangle counts tolerate duplicate, reversed and self edges") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
      .toDF("a", "b")
    val out = Graph.triangleCounts(messy).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("triangles")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangle counts on a hub graph: two fans sharing the hub edge") {
    // hub h=0 connected to 1..6; extra edges (1,2) and (3,4) → triangles
    // (0,1,2) and (0,3,4); node 0 in 2, nodes 1-4 in 1, nodes 5,6 in 0
    val edges = ((1L to 6L).map(i => (0L, i)) ++ Seq((1L, 2L), (3L, 4L))).toDF("a", "b")
    val out = Graph.triangleCounts(edges).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("triangles")).toMap
    assert(out == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }
}
