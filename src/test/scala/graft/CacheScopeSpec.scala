package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** The release contract: an operator's pins are fully recoverable by
  * closing the scope the caller passed — no global clearCache needed,
  * and nothing else's caches are touched. */
class CacheScopeSpec extends AnyFunSuite {
  import spark.implicits._

  private def cachedCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("pageRank pins via the scope; close releases exactly those pins") {
    spark.catalog.clearCache()
    val bystander = Seq(1, 2, 3).toDF("x").cache()
    bystander.count()
    val before = cachedCount
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val scope = new CacheScope
    val pr = operators.Graph.pageRank(edges, iters = 3, damping = 0.85, scope)
    assert(pr.count() == 3)
    assert(cachedCount > before, "pageRank should have filled its pinned caches")
    scope.close(blocking = true)
    assert(cachedCount == before, "close() must release every pin the call made")
    // the returned plan stays valid after release — it just recomputes
    assert(pr.count() == 3)
    assert(bystander.count() == 3) // bystander cache untouched
    bystander.unpersist(true)
  }

  test("mergeClusters honors the scope; unmanaged default tracks nothing") {
    spark.catalog.clearCache()
    val prior = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster_id")
    val pairs = Seq((2L, 3L)).toDF("id_a", "id_b")
    val scope = new CacheScope
    val merged = operators.Dedup.mergeClusters(prior, pairs, scope)
    assert(merged.count() == 3)
    scope.close(blocking = true)
    assert(cachedCount == 0)
    // unmanaged: close is a no-op and holds no references, the pin
    // itself still happens (pre-scope behavior)
    val merged2 = operators.Dedup.mergeClusters(prior, pairs)
    assert(merged2.count() == 3)
    assert(cachedCount > 0)
    CacheScope.unmanaged.close(blocking = true)
    assert(cachedCount > 0, "unmanaged close must not release anything")
    spark.catalog.clearCache()
  }

  test("scoped runs the body and closes on the way out") {
    spark.catalog.clearCache()
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val n = CacheScope.scoped { s =>
      operators.Graph.pageRank(edges, iters = 2, damping = 0.85, s).count()
    }
    assert(n == 2)
    assert(cachedCount == 0)
  }
}
