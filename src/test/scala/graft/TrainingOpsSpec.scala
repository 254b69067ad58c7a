package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark.spark
import graft.operators.TextAnalysis

/** Training-data curation operators: PII scrubbing, stratified
  * hash-sampling, sequence packing. The driver queries (q43-q45) gate
  * these against DuckDB on the test corpus; these specs pin semantics
  * on adversarial fixtures the synthetic corpus lacks (real PII
  * strings, zero-token docs, stratum boundary rates). */
class TrainingOpsSpec extends AnyFunSuite {
  import spark.implicits._

  test("dedupSegments keeps first occurrence corpus-wide and reassembles") {
    // doc 1 and doc 2 share their first 3-token segment; doc 2's copy
    // loses. doc 3 duplicates a segment WITHIN itself; second copy loses.
    val df = Seq(
      (1L, "a b c x y z"),
      (2L, "a b c q r s"),
      (3L, "m n o m n o"),
      (4L, "")) // no tokens
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupSegments(df, "doc_id", "text", 3)
      .orderBy("id").collect()
    assert(out(0).getAs[String]("clean_text") == "a b c x y z")
    assert(out(0).getAs[Long]("n_dropped") == 0L)
    assert(out(1).getAs[String]("clean_text") == "q r s") // lost "a b c"
    assert(out(1).getAs[Long]("n_dropped") == 1L)
    assert(out(2).getAs[String]("clean_text") == "m n o")
    assert(out(2).getAs[Long]("n_segs") == 2L &&
      out(2).getAs[Long]("n_dropped") == 1L)
    assert(out(3).getAs[Long]("n_segs") == 0L &&
      out(3).getAs[String]("clean_text") == "")
  }

  test("vocabCoverage scores OOV against the top-V vocabulary") {
    // counts: common x4 > mid x3 > rare x2 > once x1; V=2 -> {common, mid}
    val df = Seq(
      (1L, "common common mid rare"),
      (2L, "common mid mid rare once"),
      (3L, "common"),
      (4L, "")) // no tokens
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(df, "doc_id", "text", 2)
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("n_oov") == 1L) // rare
    assert(out(0).getAs[Double]("oov_frac") == 0.25)
    assert(out(1).getAs[Long]("n_oov") == 2L) // rare, once
    assert(out(2).getAs[Long]("n_oov") == 0L)
    assert(out(3).getAs[Long]("n_tokens") == 0L &&
      out(3).getAs[Double]("oov_frac") == 0.0)
  }

  test("unigramSurprisal: rare-token docs score more bits than common-token docs") {
    val df = Seq(
      (1L, "common common common common common common"),
      (2L, "zeta eta theta"), // three distinct singleton tokens
      (3L, "")) // no tokens
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(df, "doc_id", "text")
      .orderBy("id").collect()
    val common = out(0).getAs[Double]("avg_bits")
    val rare = out(1).getAs[Double]("avg_bits")
    // 9 tokens total: common p=6/9 -> log2(1.5)=0.585; rares p=1/9 -> 3.17
    assert(common < 1.0 && rare > 3.0 && rare < 3.2,
      s"avg_bits common=$common rare=$rare")
    assert(out(2).getAs[Long]("n_tokens") == 0L &&
      out(2).getAs[Double]("avg_bits") == 0.0)
  }

  test("bigramSurprisal: w1 marginal derived from bigram counts (hand-computed)") {
    // pins the r17 marginal-from-finer-aggregate derivation: one w1
    // ('a') spans two distinct bigrams with different counts, so a
    // wrong marginal (e.g. distinct-bigram count instead of occurrence
    // count) would shift every bit value
    val df = Seq(
      (1L, "a b a c"), // bigrams: a_b, b_a, a_c
      (2L, "a b"),     // bigram:  a_b
      (3L, ""))        // no bigrams
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisal(df, "doc_id", "text")
      .orderBy("id").collect()
    // counts: c2(a b)=2, c2(b a)=1, c2(a c)=1; c1(a)=3, c1(b)=1
    // doc1: (-log2(2/3) - log2(1/1) - log2(1/3)) / 3 = (0.58496+0+1.58496)/3
    assert(math.abs(out(0).getAs[Double]("avg_bits") - 0.7233) < 1e-4)
    assert(math.abs(out(1).getAs[Double]("avg_bits") - 0.585) < 1e-3)
    assert(out(2).getAs[Long]("n_bigrams") == 0L &&
      out(2).getAs[Double]("avg_bits") == 0.0)
  }

  test("deterministicShuffle: stable across reruns, contiguous positions per shard") {
    val df = (0L until 200L).toDF("doc_id")
    def run() = TextAnalysis.deterministicShuffle(df, "doc_id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val a = run(); val b = run()
    assert(a.toSeq == b.toSeq, "ordering must be identical across reruns")
    // positions within each shard are 0..n-1 with no gaps
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // the hash ordering is not the id ordering (it actually shuffles)
    val shard0 = a.filter(_._2 == a(0)._2).sortBy(_._3).map(_._1)
    assert(shard0.toSeq != shard0.sorted.toSeq, "hash order must differ from id order")
  }

  test("piiScrub counts and redacts emails, urls and phones") {
    val df = Seq(
      (1L, "contact john.doe+x@ex-ample.org or jane@b.co today"),
      (2L, "docs at https://spark.apache.org/docs and http://a.io/x?q=1"),
      (3L, "call +225 01 02 03 04 05 or 07-08-09-10-11 now"),
      (4L, "clean text, no pii at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_emails") == 2)
    assert(out(1).getAs[Long]("n_urls") == 2)
    assert(out(2).getAs[Long]("n_phones") == 2)
    assert(out(3).getAs[Long]("n_emails") == 0 &&
      out(3).getAs[Long]("n_phones") == 0 &&
      out(3).getAs[Long]("clean_len") == "clean text, no pii at all".length)
    // redaction really shrinks the scrubbed text
    assert(out(0).getAs[Long]("clean_len") <
      "contact john.doe+x@ex-ample.org or jane@b.co today".length)
  }

  test("stratifiedHashSample honors per-stratum rates and is deterministic") {
    val df = (0L until 300L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "grp")
    def run() = TextAnalysis.stratifiedHashSample(
      df, "id", col("grp"), Map("a" -> 100, "b" -> 0), 50)
      .select("id", "stratum").collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    val s1 = run(); val s2 = run()
    assert(s1.sameElements(s2), "hash sampling must be reproducible")
    val byStratum = s1.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byStratum.getOrElse("a", 0) == 100, "rate 100 keeps every row")
    assert(!byStratum.contains("b"), "rate 0 drops every row")
    val c = byStratum.getOrElse("c", 0)
    assert(c > 25 && c < 75, s"default rate 50 kept $c of 100")
  }

  test("packSequences chunk accounting on a hand-computed fixture") {
    // one shard; token counts 4, 8, 3, 0, 9 with ctx 10:
    //   doc 0: start 0,  end 4  -> chunk 0..0, spans 1
    //   doc 1: start 4,  end 12 -> chunk 0..1, spans 2 (crosses boundary)
    //   doc 2: start 12, end 15 -> chunk 1..1, spans 1
    //   doc 3: start 15, end 15 -> zero tokens, spans 0
    //   doc 4: start 15, end 24 -> chunk 1..2, spans 2
    val docs = Seq(
      (0L, "a b c d"), (1L, "a b c d e f g h"), (2L, "a b c"),
      (3L, ""), (4L, "a b c d e f g h i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(docs, "doc_id", "text", 10, 1)
      .orderBy("doc_id")
      .select("start_token", "first_chunk", "last_chunk", "chunks_spanned")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 0L, 0L, 1L), (4L, 0L, 1L, 2L), (12L, 1L, 1L, 1L),
      (15L, 1L, 1L, 0L), (15L, 1L, 2L, 2L)))
  }

  test("mixtureWeights: named shares fixed, leftover split, upsampling epochs") {
    // a: named 50% of the 1000-token budget over 100 avail -> rate 5,
    // 5 epochs (upsample); b/c split the leftover 25% each
    val docs = Seq(
      ("a", "one two three four five six seven eight nine ten"), // 10 tokens x 10 docs
      ("b", "one two three four five six seven eight nine ten"),
      ("c", "one two"))
      .flatMap { case (s, t) => (1 to 10).map(_ => (s, t)) }
      .toDF("source", "text")
    val out = TextAnalysis.mixtureWeights(docs, "source", "text",
        Map("a" -> 0.5), 1000L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", 100L, 0.5, 5.0, 5L),
      ("b", 100L, 0.25, 2.5, 3L),
      ("c", 20L, 0.25, 12.5, 13L)))
  }

  test("contaminationStats flags benchmark-overlapping docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),      // = benchmark doc
      (2L, "alpha beta gamma delta zeta"),         // shares 2 of 3 3-grams
      (3L, "one two three four five"),             // disjoint
      (4L, "ab"))                                  // too short: zero grams
      .toDF("doc_id", "text")
    val bench = Seq((99L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = TextAnalysis.contaminationStats(docs, "doc_id", "text", bench, "text", 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, 1L), (2L, 3L, 2L, 1L), (3L, 3L, 0L, 0L), (4L, 0L, 0L, 0L)))
  }

  test("repetitionStats on a hand-computed repetitive doc") {
    // "a b a b a b": 3-grams = aba, bab, aba, bab -> total 4, distinct
    // 2, top 2 -> dup 0.5, top 0.5; clean doc: all distinct
    val docs = Seq((1L, "a b a b a b"), (2L, "one two three four"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text", 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1L, 4L, 2L, 2L, 0.5, 0.5),
      (2L, 2L, 2L, 1L, 0.0, 0.5),
      (3L, 0L, 0L, 0L, 0.0, 0.0)))
  }

  test("dedupSegments elects winners without a window (modal-segment skew path)") {
    // the modal boilerplate segment of a web crawl lands every copy in
    // one window partition; winner election must be the map-side-
    // combinable min + join shape, which AQE can skew-split
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.dedupSegments(df, "doc_id", "text", 3)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Window"),
      s"winner election must be agg+join, not a window:\n$plan")
  }

  test("stratifiedHashSample rejects inputs that already carry its output columns") {
    val df = Seq((1L, "x", 3L)).toDF("id", "text", "bucket")
    val err = intercept[IllegalArgumentException] {
      TextAnalysis.stratifiedHashSample(df, "id", lit("s"), Map("s" -> 50), 10)
    }
    assert(err.getMessage.contains("bucket"))
  }

  test("mixtureWeights releases an absent named source's share to the leftover pool") {
    // web named 0.6; code named 0.4 but ABSENT from the data; books
    // unnamed. books must get the full present-share leftover 0.4 —
    // not 0.0 with 40% of the token budget silently unspent
    val docs = ((1 to 10).map(_ => ("web", "one two three four five")) ++
      (1 to 10).map(_ => ("books", "one two three four five")))
      .toDF("source", "text")
    val out = TextAnalysis.mixtureWeights(docs, "source", "text",
        Map("web" -> 0.6, "code" -> 0.4), 1000L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    assert(out.toSeq == Seq(("books", 0.4), ("web", 0.6)))
  }
}
