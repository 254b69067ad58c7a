package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All pure Column
  * expressions (whole-stage codegen, no UDF boundary) — at 100 TB these
  * run inside the same scan stage as the parquet read, shuffle-free.
  */
object TextAnalysis {

  /** Marker words per language for the n-gram-heuristic language ID.
    * Counted as substring occurrences over the space-padded lowercase
    * body, so both Catalyst and the SQL oracle replay it byte-for-byte. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "fr" -> Seq(" le ", " la ", " et ", " les "),
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "es" -> Seq(" el ", " los ", " y ", " es "))

  /** Stopwords used by the quality score (subset of the reference's
    * 30-entry French+English stoplist, deduplicate.py:45-70). */
  val stopwords: Seq[String] = Seq(
    "the", "and", "of", "is", "a", "an", "in", "on", "to", "for",
    "le", "la", "les", "et", "de", "des", "un", "une")

  private def padded(text: Column): Column = concat(lit(" "), lower(text), lit(" "))

  /** Per-language marker-count scores; columns `score_<lang>`. */
  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, ms) =>
      s"score_$lang" -> ms.map(m => occurrences(padded(text), m)).reduce(_ + _)
    }

  /** Predicted language: argmax of marker scores, first-listed wins
    * ties, "und" (undetermined) when every score is zero. */
  def langId(text: Column): Column = {
    val scores = langMarkers.map(_._1).zip(langScores(text).map(_._2))
    val total = scores.map(_._2).reduce(_ + _)
    val best = scores.tail.foldLeft(when(lit(true), lit(scores.head._1)) -> scores.head._2) {
      case ((pick, bestScore), (lang, s)) =>
        (when(s > bestScore, lit(lang)).otherwise(pick),
          greatest(bestScore, s))
    }._1
    when(total === 0, lit("und")).otherwise(best)
  }

  /** Quality features + composite score per document. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val tokSet = array_distinct(toks)
    val nToks = size(toks).cast("long")
    val stopHits = size(array_intersect(tokSet, lit(stopwords.toArray))).cast("double")
    val nToksSafe = greatest(nToks.cast("double"), lit(1.0))
    val distinctRatio = size(tokSet).cast("double") / nToksSafe
    val avgTokLen = (length(concat_ws("", toks)).cast("double") / nToksSafe)
    df.select(
      col(idCol),
      nToks.as("n_tokens"),
      round(avgTokLen + 1e-9, 4).as("avg_token_len"),
      round(distinctRatio + 1e-9, 4).as("distinct_ratio"),
      round(stopHits / greatest(size(tokSet).cast("double"), lit(1.0)) + 1e-9, 4)
        .as("stopword_type_ratio"),
      round(least(nToks.cast("double") / 100.0, lit(1.0)) * distinctRatio + 1e-9, 4)
        .as("quality"))
  }

  /** Token-count accounting: whitespace tokens, BPE-ish pieces (letter
    * runs / digit runs / single other-glyphs), characters. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(filter(split(col(textCol), "[ \\t\\n\\r\\f]+"), t => length(t) > 0))
        .cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)), lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f]"), lit(0)))
        .cast("long").as("bpe_pieces"),
      length(col(textCol)).cast("long").as("n_chars"))

  /** Canonical-text md5 fingerprint + rolling-prefix band for bucketing. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      fingerprint(col(textCol)).as("fp"),
      substring(fingerprint(col(textCol)), 1, 4).as("fp_band"),
      length(normalizeText(col(textCol))).cast("long").as("norm_len"))
}
