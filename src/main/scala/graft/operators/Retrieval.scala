package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Lexical retrieval over a document corpus: Okapi BM25 scoring and
  * top-k search for a fixed term set — the standard quality-retrieval
  * primitive a training-data pipeline uses for targeted corpus pulls
  * (e.g. "find the docs most about X" before a curation pass).
  *
  * Scale shape (100 TB): one linear scan tokenizes each document and
  * keeps ONLY postings for the query terms before any shuffle — the
  * grouped state after the map stage is O(matching doc-term pairs),
  * not O(corpus tokens). Corpus statistics (doc count, average doc
  * length) are a one-row aggregate and the per-term document
  * frequencies are a |terms|-row aggregate; both join back via
  * `broadcast`, so the whole plan is: scan → partial agg → two tiny
  * broadcast joins → final top-k (TakeOrderedAndProject). No
  * all-corpus sort, no wide shuffle beyond the doc-term aggregation.
  */
object Retrieval {

  /** BM25 score per document containing at least one query term.
    *
    * @param docs    corpus with an id column and a text column
    * @param terms   query term set (already lowercased)
    * @param k1      term-frequency saturation (Robertson default 1.2)
    * @param b       length normalization (default 0.75)
    * @return (doc_id, score) — raw double scores, caller rounds
    */
  def bm25Scores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.forall(t => t == t.toLowerCase))
    val toks = docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val stats = toks.agg(
      count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))
    // Filter to query terms BEFORE the generate: shuffle input is only
    // the matching postings. explode_outer + null filter keeps the
    // staged filtered array from being re-inlined under the generate
    // (InferFiltersFromGenerate — see SCALE.md).
    val postings = toks
      .select(col("doc_id"), col("dl"),
        explode_outer(filter(col("toks"), t => t.isInCollection(terms))).as("term"))
      .where(col("term").isNotNull)
    val tf = postings
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df), "term")
      .join(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(sum(col("w")).as("score"))
  }

  /** Top-k BM25 retrieval; ties broken by doc id so ordering is total.
    * Rounding happens BEFORE the sort so both engines rank identical
    * values (ulp drift from different summation orders cannot reorder
    * the boundary). */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    bm25Scores(docs, idCol, textCol, terms, k1, b)
      .select(col("doc_id"), graft.queries.roundSafe(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
}
