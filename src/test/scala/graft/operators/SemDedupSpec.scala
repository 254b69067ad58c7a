package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class SemDedupSpec extends AnyFunSuite {
  import spark.implicits._

  // cluster 0: ids 1,2 parallel (cos=1), id 3 orthogonal;
  // cluster 1: ids 4,5 near-parallel
  private val vecs = Seq(
    (1L, 0, Seq(1.0f, 0.0f, 0.0f)),
    (2L, 0, Seq(2.0f, 0.0f, 0.0f)),
    (3L, 0, Seq(0.0f, 1.0f, 0.0f)),
    (4L, 1, Seq(0.0f, 0.0f, 1.0f)),
    (5L, 1, Seq(0.0f, 0.1f, 1.0f)))
    .toDF("vec_id", "label", "embedding")

  test("dropIds drops the higher id of each near-duplicate pair only") {
    val drops = SemDedup.dropIds(vecs, "vec_id", "label", "embedding", 0.9)
      .as[Long].collect().toSet
    assert(drops == Set(2L, 5L)) // 2 dups 1; 5 dups 4 (cos≈0.995); 3 survives
  }

  test("cross-cluster duplicates are never compared") {
    // same vector in different clusters → no drop
    val df = Seq(
      (1L, 0, Seq(1.0f, 0.0f)), (2L, 1, Seq(1.0f, 0.0f))).toDF("vec_id", "label", "embedding")
    assert(SemDedup.dropIds(df, "vec_id", "label", "embedding", 0.5).isEmpty)
  }

  test("centroids average per dimension in order") {
    val c = SemDedup.centroids(vecs, "label", "embedding")
      .collect().map(r => r.getAs[Int]("cl") -> r.getSeq[Double](1)).toMap
    assert(c(0) == Seq(1.0, 1.0 / 3.0, 0.0)) // mean of (1,0,0),(2,0,0),(0,1,0)
    // float32 0.1f widens to 0.100000001…, so compare at float precision
    assert(c(1).head == 0.0 && math.abs(c(1)(1) - 0.05) < 1e-7)
  }

  test("summary accounts every row exactly once and bounds mean cosine") {
    val out = SemDedup.summary(vecs, "vec_id", "label", "embedding", 0.9)
      .collect().map(r => r.getAs[Int]("cl") -> r).toMap
    assert(out(0).getAs[Long]("n") == 3L)
    assert(out(0).getAs[Long]("n_dropped") == 1L && out(0).getAs[Long]("n_kept") == 2L)
    assert(out(1).getAs[Long]("n_dropped") == 1L && out(1).getAs[Long]("n_kept") == 1L)
    out.values.foreach { r =>
      val m = r.getAs[Double]("mean_cent_cos")
      assert(m >= -1.0 - 1e-9 && m <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n") == r.getAs[Long]("n_dropped") + r.getAs[Long]("n_kept"))
    }
  }
}
