package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class AnnSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("IVF search approximates brute-force top-5 with decent recall") {
    val corpus = graft.Engine.table(spark, sfDir, "embeddings")
    val queryIds = (0L until 10L).toSeq
    val queries = corpus.where(org.apache.spark.sql.functions.col("vec_id")
      .isin(queryIds: _*))

    val exact = SimilaritySearch
      .bruteForceTopK(corpus, "vec_id", "embedding", queryIds, 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet

    val index = SimilaritySearch.ivfIndex(corpus, "vec_id", "embedding",
      nLists = 8, seed = 42L)
    val approx = SimilaritySearch
      .ivfSearch(index, queries, "vec_id", "embedding", k = 5, nProbe = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet

    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
    assert(approx.size == exact.size) // k results per query
  }

  test("as-of join with tolerance nulls out stale matches; forward finds next") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 5000L, "p2")).toDF("k", "ts", "name")
    val right = Seq((1L, 90L, "c1"), (1L, 4000L, "c2")).toDF("k", "rts", "payload")

    val tol = AsOfJoin.backward(left, right, "k", "ts", "rts",
      Seq("payload"), toleranceOpt = Some(100L))
      .orderBy("ts").collect()
    assert(tol(0).getAs[String]("payload") == "c1") // gap 10 <= 100
    // p2's latest prior is c2 at gap 1000 > tolerance -> nulled
    assert(tol(1).isNullAt(tol(1).fieldIndex("payload")))

    val fwd = AsOfJoin.forward(left, right, "k", "ts", "rts", Seq("payload"))
      .orderBy("ts").collect()
    // p1 at 100 -> next right at 4000 (c2); p2 at 5000 -> none after
    assert(fwd(0).getAs[String]("payload") == "c2")
    assert(fwd(1).isNullAt(fwd(1).fieldIndex("payload")))
  }
}
