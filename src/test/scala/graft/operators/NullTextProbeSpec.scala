package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** Null/empty/whitespace documents through the LSH dedup family.
  *
  * Output semantics were always right (no-token docs can never clear a
  * jaccard threshold, and survivors keep them as singletons); what
  * this suite additionally pins is the SCALE guard: a no-token doc's
  * all-null minhash signature bands to concat_ws("") — without the
  * pre-band prune every such doc in the corpus funnels into one bucket
  * and the candidate join goes quadratic on them (a few percent of a
  * real crawl is millions of docs). The prune must stay below the
  * banding in the plan.
  */
class NullTextProbeSpec extends AnyFunSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
    (3L, null.asInstanceOf[String]), (4L, ""), (5L, null.asInstanceOf[String]),
    (6L, "   ")).toDF("doc_id", "text")

  test("no-token docs produce no pairs; real twins still match") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 4, 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("survivors keep no-token docs as singletons") {
    val kept = Dedup.nearDedup(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L, 6L))
  }

  test("incremental pairs: no-token docs on either side never surface") {
    val batch = docs.where(col("doc_id").isin(2L, 3L))
    val corpus = docs.where(!col("doc_id").isin(2L, 3L))
    val out = Dedup.incrementalLshPairs(batch, corpus, "doc_id", "text", 16, 4, 0.4)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((2L, 1L)))
  }

  test("the degenerate-doc prune sits below the banding in the plan") {
    // the guard that prevents the one-bucket quadratic candidate blowup:
    // the has-a-token prune (lower(text) RLIKE [a-z] — the cheap
    // equivalent of size(toks) > 0 that does not re-inline the cascade
    // into the scan filter) must survive optimization into the physical
    // plan of the pair generation (if a refactor drops it, outputs stay
    // identical and only a scale test at crawl size would notice).
    // Parquet-backed input: over a LocalRelation the optimizer folds
    // the prune at plan time (ConvertToLocalRelation), which hides it
    // from the plan text without weakening it — the scan path is what
    // production runs.
    val dir = java.nio.file.Files.createTempDirectory("nulltext").toString
    docs.write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val stored = spark.read.parquet(s"$dir/docs.parquet")
    val p = Dedup.minhashLshPairs(stored, "doc_id", "text", 16, 4, 0.4)
      .queryExecution.executedPlan.toString
    assert("RLIKE".r.findFirstIn(p).isDefined,
      s"expected the has-a-token degenerate-doc prune in the plan:\n$p")
  }
}
