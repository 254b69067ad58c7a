package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.functions.TextFunctions
import graft.operators.TextAnalysis

/** Training-data curation surface beyond the reference: reproducible
  * stratified sampling, sequence-packing accounting, and PII scrubbing
  * over the `documents` corpus. All map-side or single-shuffle plans;
  * oracle SQL replays the identical arithmetic in DuckDB.
  */
object TrainingOps {

  private val SampleRates = Map("en" -> 50, "fr" -> 30)
  private val DefaultRate = 10

  /** Deterministic stratified hash-sample by predicted language. */
  private def q43(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.stratifiedHashSample(
      table(s, dir, "documents"), "doc_id",
      TextAnalysis.langId(col("text")), SampleRates, DefaultRate)
      .select(col("doc_id"), col("stratum"), col("bucket"))
      .orderBy(col("doc_id"))

  /** DuckDB replay of [[TextAnalysis.langId]] — shared builders, so
    * the q21 and q43 oracles cannot drift apart. */
  private def sqlLangCase: String =
    s"""sc AS (SELECT doc_id, ${TextAnalysis.sqlLangScoreExprs} FROM documents),
        lang AS (SELECT doc_id, ${TextAnalysis.sqlLangIdCase("stratum")}
        FROM sc)"""

  private val q43Sql = {
    val rateCase = SampleRates.toSeq.sortBy(_._1)
      .map { case (l, r) => s"WHEN stratum = '$l' THEN $r" }
      .mkString(" ")
    s"""WITH $sqlLangCase
        SELECT doc_id, stratum,
          (${TextFunctions.sqlTokenHash("doc_id::VARCHAR")} % 100) AS bucket
        FROM lang
        WHERE (${TextFunctions.sqlTokenHash("doc_id::VARCHAR")} % 100) <
          (CASE $rateCase ELSE $DefaultRate END)
        ORDER BY doc_id"""
  }

  private val CtxLen = 2048
  private val NShards = 8

  /** Concat-then-chunk packing accounting, sharded. */
  private def q44(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.packSequences(table(s, dir, "documents"), "doc_id", "text",
        CtxLen, NShards)
      .orderBy(col("doc_id"))

  private val q44Sql =
    s"""WITH t AS (SELECT doc_id, doc_id % $NShards AS shard,
          len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> len(x) > 0))::BIGINT
            AS n_tokens
          FROM documents),
        w AS (SELECT doc_id, shard, n_tokens,
          sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING)::BIGINT AS end_token FROM t)
        SELECT doc_id, shard, n_tokens,
          (end_token - n_tokens) AS start_token,
          ((end_token - n_tokens) // $CtxLen) AS first_chunk,
          CASE WHEN n_tokens = 0 THEN ((end_token - n_tokens) // $CtxLen)
               ELSE ((end_token - 1) // $CtxLen) END AS last_chunk,
          CASE WHEN n_tokens = 0 THEN 0
               ELSE ((end_token - 1) // $CtxLen) - ((end_token - n_tokens) // $CtxLen) + 1
          END AS chunks_spanned
        FROM w ORDER BY doc_id"""

  /** PII match counting + redaction accounting. */
  private def q45(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.piiScrub(table(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val q45Sql = {
    // DuckDB '...' literals do not process backslashes — patterns pass
    // through verbatim (same Java-regex/RE2-compatible syntax).
    val email = TextAnalysis.piiEmail
    val url = TextAnalysis.piiUrl
    val phone = TextAnalysis.piiPhone
    s"""SELECT doc_id,
        len(regexp_extract_all(text, '$email'))::BIGINT AS n_emails,
        len(regexp_extract_all(text, '$url'))::BIGINT AS n_urls,
        len(regexp_extract_all(text, '$phone'))::BIGINT AS n_phones,
        length(regexp_replace(regexp_replace(regexp_replace(text,
          '$email', '<EMAIL>', 'g'),
          '$url', '<URL>', 'g'),
          '$phone', '<PHONE>', 'g'))::BIGINT AS clean_len
        FROM documents ORDER BY doc_id"""
  }

  val all: Seq[Q] = Seq(
    Q("q43_stratified_sample", q43 _, Some(q43Sql)),
    Q("q44_pack_sequences", q44 _, Some(q44Sql)),
    Q("q45_pii_scrub", q45 _, Some(q45Sql)))
}
