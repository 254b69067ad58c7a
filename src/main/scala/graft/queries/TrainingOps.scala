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

  /** Deterministic stratified hash-sample by predicted language.
    * Spread: the langId kernel over a single-file scan would otherwise
    * run on one core (SCALE.md). */
  private def q43(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.stratifiedHashSample(
      graft.Engine.spread(table(s, dir, "documents")), "doc_id",
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
    TextAnalysis.packSequences(graft.Engine.spread(table(s, dir, "documents")),
        "doc_id", "text", CtxLen, NShards)
      .orderBy(col("doc_id"))

  private val q44Sql =
    s"""WITH t AS (SELECT doc_id, ((doc_id % $NShards) + $NShards) % $NShards AS shard,
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
    TextAnalysis.piiScrub(graft.Engine.spread(table(s, dir, "documents")),
        "doc_id", "text")
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

  private val DecontamN = 5

  /** Benchmark decontamination: every 50th doc stands in as the eval
    * benchmark; stats = each doc's 5-gram overlap with its universe. */
  private def q54(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.contaminationStats(
      graft.Engine.spread(table(s, dir, "documents")), "doc_id", "text",
      graft.Engine.spread(table(s, dir, "documents"))
        .where(col("doc_id") % 50 === 0), "text",
      DecontamN)
      .orderBy(col("id"))

  private val q54Sql = {
    val toks = TextFunctions.sqlTokensAll("text")
    val grams = TextFunctions.sqlShingles("tk", DecontamN)
    s"""WITH tt AS (SELECT doc_id AS id, $toks AS tk FROM documents),
        t AS (SELECT id, list_distinct(list_transform($grams,
                g -> ${TextFunctions.sqlTokenHash("g")})) AS gs FROM tt),
        bg AS (SELECT DISTINCT unnest(gs) AS g FROM t WHERE id % 50 = 0),
        e AS (SELECT id, unnest(gs) AS g FROM t),
        hits AS (SELECT e.id, count(*) AS nc FROM e JOIN bg USING (g) GROUP BY e.id)
        SELECT t.id, len(t.gs)::BIGINT AS n_grams,
          coalesce(nc, 0)::BIGINT AS n_contaminated,
          round((CASE WHEN len(t.gs) = 0 THEN 0.0
                 ELSE coalesce(nc, 0)::DOUBLE / len(t.gs)::DOUBLE END) + 1e-9, 6)
            AS contamination_frac,
          (coalesce(nc, 0) > 0)::BIGINT AS contaminated
        FROM t LEFT JOIN hits ON t.id = hits.id ORDER BY t.id"""
  }

  private val RepN = 3

  /** Intra-doc repetition signals (Gopher-style): dup and modal-gram
    * fractions over 3-grams. */
  private def q55(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(graft.Engine.spread(table(s, dir, "documents")),
        "doc_id", "text", RepN)
      .orderBy(col("id"))

  private val q55Sql = {
    val toks = TextFunctions.sqlTokensAll("text")
    val grams = TextFunctions.sqlShingles("tk", RepN)
    s"""WITH tt AS (SELECT doc_id AS id, $toks AS tk FROM documents),
        e AS (SELECT id, unnest($grams) AS g FROM tt),
        pc AS (SELECT id, g, count(*) AS c FROM e GROUP BY id, g),
        agg AS (SELECT id, sum(c) AS total, count(*) AS dist, max(c) AS top
                FROM pc GROUP BY id)
        SELECT tt.id,
          coalesce(total, 0)::BIGINT AS total_grams,
          coalesce(dist, 0)::BIGINT AS distinct_grams,
          coalesce(top, 0)::BIGINT AS top_gram_count,
          round((CASE WHEN coalesce(total, 0) = 0 THEN 0.0
                 ELSE (total - dist)::DOUBLE / total::DOUBLE END) + 1e-9, 6) AS dup_frac,
          round((CASE WHEN coalesce(total, 0) = 0 THEN 0.0
                 ELSE top::DOUBLE / total::DOUBLE END) + 1e-9, 6) AS top_frac
        FROM tt LEFT JOIN agg ON tt.id = agg.id ORDER BY tt.id"""
  }

  /** Quality-threshold corpus pruning: keep documents whose quality
    * score clears the corpus median — the percentile-cut curation
    * step. The threshold is a one-row aggregate broadcast into the
    * filter (a scan + tiny agg + broadcast-filter scan; no corpus
    * shuffle), the shape that survives any corpus size. */
  private def q57(s: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityScore(
        graft.Engine.spread(table(s, dir, "documents")), "doc_id", "text")
      .select(col("doc_id"), col("quality"))
    val threshold = scored.agg(
      expr("percentile(quality, 0.5)").as("p50"))
    scored.join(broadcast(threshold))
      .where(col("quality") >= col("p50"))
      .select(col("doc_id"), col("quality"),
        roundSafe(col("p50"), 4).as("p50"))
      .orderBy(col("doc_id"))
  }

  private val q57Sql = {
    val stop = TextAnalysis.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    // quality = min(n/100, 1) * distinct_ratio — same derivation as the
    // q22 oracle, rounded identically (the q22 oracle rounds to 4)
    s"""WITH t AS (SELECT doc_id,
          len(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> len(x) > 0)) AS n,
          len(list_distinct(list_filter(string_split_regex(lower(text), '[^a-z]+'),
            x -> len(x) > 0))) AS nd
          FROM documents),
        q AS (SELECT doc_id,
          round((least(n::DOUBLE / 100.0, 1.0) * (nd::DOUBLE / greatest(n, 1))) + 1e-9, 4)
            AS quality FROM t),
        thr AS (SELECT quantile_cont(quality, 0.5) AS p50 FROM q)
        SELECT doc_id, quality, round(p50 + 1e-9, 4) AS p50
        FROM q, thr WHERE quality >= p50 ORDER BY doc_id"""
  }

  private val MixShares = Map("src0" -> 0.25, "src1" -> 0.25)
  private val MixBudget = 1000000L

  /** Domain-mixture weighting: named sources get fixed target shares,
    * the rest split the leftover; output is the per-source sampling
    * table a data loader consumes. */
  private def q58(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.mixtureWeights(graft.Engine.spread(table(s, dir, "documents")),
        "source", "text", MixShares, MixBudget)
      .orderBy(col("source"))

  private val q58Sql =
    s"""WITH inv AS (
          SELECT source, count(*)::BIGINT AS n_docs,
            sum(len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
              x -> len(x) > 0)))::BIGINT AS avail_tokens
          FROM documents GROUP BY source),
        tot AS (SELECT count(*) AS nsrc,
                  sum(CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END) AS nnamed
                FROM inv),
        sh AS (SELECT source, n_docs, avail_tokens,
                 CASE WHEN source = 'src1' THEN 0.25::DOUBLE
                      WHEN source = 'src0' THEN 0.25::DOUBLE
                      ELSE (1.0::DOUBLE - 0.5::DOUBLE)
                           / greatest(nsrc - nnamed, 1) END AS share
               FROM inv, tot)
        SELECT source, n_docs, avail_tokens,
          round(share + 1e-9, 6) AS target_share,
          round((share * $MixBudget / greatest(avail_tokens::DOUBLE, 1.0)) + 1e-9, 6)
            AS sampling_rate,
          ceil(share * $MixBudget / greatest(avail_tokens::DOUBLE, 1.0))::BIGINT AS epochs
        FROM sh ORDER BY source"""

  private val ChunkTokens = 64
  private val ChunkOverlap = 16

  /** Overlapping token-window chunking (64-token windows, 16 overlap)
    * — the retrieval/embedding prep step. Shuffle-free generate. */
  private def q64(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkDocuments(graft.Engine.spread(table(s, dir, "documents")),
        "doc_id", "text", ChunkTokens, ChunkOverlap)
      .orderBy(col("id"), col("chunk_idx"))

  private val q64Sql = {
    val stride = ChunkTokens - ChunkOverlap
    s"""WITH t AS (SELECT doc_id AS id,
          list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> len(x) > 0) AS toks
          FROM documents),
        n AS (SELECT id, toks, len(toks)::BIGINT AS n FROM t WHERE len(toks) > 0),
        x AS (SELECT id, toks,
                (CASE WHEN n > $ChunkTokens
                      THEN (n - $ChunkTokens + ${stride - 1}) // $stride
                      ELSE 0 END + 1) AS nc FROM n),
        c AS (SELECT id, i AS chunk_idx,
                list_slice(toks, (i * $stride + 1)::INT, (i * $stride + $ChunkTokens)::INT) AS ctoks
              FROM x, unnest(range(0, nc)) AS u(i))
        SELECT id, chunk_idx::BIGINT AS chunk_idx,
          (chunk_idx * $stride)::BIGINT AS start_token,
          len(ctoks)::BIGINT AS n_tokens,
          array_to_string(ctoks, ' ') AS chunk_text
        FROM c ORDER BY id, chunk_idx"""
  }

  private val SegTokens = 6

  /** C4-style segment-level exact dedup: first occurrence corpus-wide
    * wins, documents reassembled from surviving segments. */
  private def q65(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dedupSegments(table(s, dir, "documents"), "doc_id", "text",
        SegTokens)
      .orderBy(col("id"))

  private val q65Sql = {
    val S = SegTokens
    s"""WITH t AS (SELECT doc_id AS id,
          list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> len(x) > 0) AS toks
          FROM documents),
        n AS (SELECT id, toks, len(toks)::BIGINT AS n FROM t WHERE len(toks) > 0),
        x AS (SELECT id, toks,
                (CASE WHEN n > $S THEN (n - $S + ${S - 1}) // $S ELSE 0 END + 1) AS nc
              FROM n),
        c AS (SELECT id, i AS seg_idx,
                array_to_string(list_slice(toks, (i * $S + 1)::INT, (i * $S + $S)::INT), ' ')
                  AS seg_text
              FROM x, unnest(range(0, nc)) AS u(i)),
        m AS (SELECT id, seg_idx, seg_text,
                row_number() OVER (PARTITION BY seg_text ORDER BY id, seg_idx) AS rn
              FROM c),
        agg AS (SELECT id, count(*)::BIGINT AS n_segs,
                  sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
                  string_agg(CASE WHEN rn = 1 THEN seg_text END, ' ' ORDER BY seg_idx)
                    AS clean_text
                FROM m GROUP BY id)
        SELECT d.doc_id AS id, coalesce(n_segs, 0)::BIGINT AS n_segs,
          coalesce(n_dropped, 0)::BIGINT AS n_dropped,
          coalesce(clean_text, '') AS clean_text
        FROM documents d LEFT JOIN agg ON d.doc_id = agg.id ORDER BY id"""
  }

  private val VocabV = 20

  /** Top-V vocabulary + per-doc OOV coverage. */
  private def q66(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(table(s, dir, "documents"), "doc_id", "text",
        VocabV)
      .orderBy(col("id"))

  private val q66Sql =
    s"""WITH tk AS (SELECT doc_id AS id,
          unnest(${TextFunctions.sqlTokensAll("text")}) AS tok FROM documents),
        vocab AS (SELECT tok AS vtok FROM (
          SELECT tok, count(*) AS c FROM tk GROUP BY tok
          ORDER BY c DESC, tok LIMIT $VocabV)),
        per AS (SELECT id, count(*)::BIGINT AS n_tokens,
                  sum(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
                FROM tk LEFT JOIN vocab ON tok = vtok GROUP BY id)
        SELECT d.doc_id AS id, coalesce(n_tokens, 0)::BIGINT AS n_tokens,
          coalesce(n_oov, 0)::BIGINT AS n_oov,
          round((CASE WHEN coalesce(n_tokens, 0) = 0 THEN 0.0
                 ELSE n_oov::DOUBLE / n_tokens::DOUBLE END) + 1e-9, 6) AS oov_frac
        FROM documents d LEFT JOIN per ON d.doc_id = per.id ORDER BY id"""

  /** Unigram-LM surprisal (perplexity-filter stand-in). */
  private def q67(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramSurprisal(graft.Engine.spread(table(s, dir, "documents")),
        "doc_id", "text")
      .orderBy(col("id"))

  private val q67Sql =
    s"""WITH tk AS (SELECT doc_id AS id,
          unnest(${TextFunctions.sqlTokensAll("text")}) AS tok FROM documents),
        cnt AS (SELECT tok, count(*)::DOUBLE AS c FROM tk GROUP BY tok),
        tot AS (SELECT sum(c) AS total FROM cnt),
        per AS (SELECT id, count(*)::BIGINT AS n_tokens,
                  sum(-log2(c / total)) / count(*) AS avgb
                FROM tk JOIN cnt USING (tok), tot GROUP BY id)
        SELECT d.doc_id AS id, coalesce(n_tokens, 0)::BIGINT AS n_tokens,
          round(coalesce(avgb, 0.0) + 1e-9, 4) AS avg_bits
        FROM documents d LEFT JOIN per ON d.doc_id = per.id ORDER BY id"""

  private val ShuffleShards = 4

  /** Deterministic shuffle + shard/position assignment for export. */
  private def q68(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.deterministicShuffle(table(s, dir, "documents"), "doc_id",
        ShuffleShards)
      .orderBy(col("id"))

  private val q68Sql =
    s"""SELECT id, shard,
          (row_number() OVER (PARTITION BY shard ORDER BY md5(id::VARCHAR), id) - 1)::BIGINT
            AS pos
        FROM (SELECT doc_id AS id,
                (${TextFunctions.sqlTokenHash("doc_id::VARCHAR")} % $ShuffleShards) AS shard
              FROM documents)
        ORDER BY id"""

  val all: Seq[Q] = Seq(
    Q("q43_stratified_sample", q43 _, Some(q43Sql)),
    Q("q44_pack_sequences", q44 _, Some(q44Sql)),
    Q("q45_pii_scrub", q45 _, Some(q45Sql)),
    Q("q54_decontamination", q54 _, Some(q54Sql)),
    Q("q55_repetition_stats", q55 _, Some(q55Sql)),
    Q("q57_quality_filter", q57 _, Some(q57Sql)),
    Q("q58_mixture_weights", q58 _, Some(q58Sql)),
    Q("q64_chunk_documents", q64 _, Some(q64Sql)),
    Q("q65_segment_dedup", q65 _, Some(q65Sql)),
    Q("q66_vocab_coverage", q66 _, Some(q66Sql)),
    Q("q67_unigram_surprisal", q67 _, Some(q67Sql)),
    Q("q68_deterministic_shuffle", q68 _, Some(q68Sql)),
    // q90's SQL lives in a lazy val: `all` sits above it in source
    // order, and object vals initialize top-to-bottom
    Q("q90_bigram_surprisal", q90 _, Some(q90Sql)))

  /** Bigram conditional surprisal (perplexity-filter step 2).
    * Engine.spread: the tokenize+shingle kernel over a single-file
    * scan would otherwise run on one core (SCALE.md invariant). */
  private def q90(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramSurprisal(
        graft.Engine.spread(table(s, dir, "documents")), "doc_id", "text")
      .orderBy(col("id"))

  private lazy val q90Sql =
    s"""WITH tk AS (SELECT doc_id AS id, ${TextFunctions.sqlTokensAll("text")} AS toks
          FROM documents),
        bg AS (SELECT id, unnest(${TextFunctions.sqlShingles("toks", 2)}) AS bg FROM tk),
        b2 AS (SELECT id, bg, string_split(bg, ' ')[1] AS w1 FROM bg),
        c2 AS (SELECT bg, count(*)::DOUBLE AS c2 FROM b2 GROUP BY bg),
        c1 AS (SELECT w1, count(*)::DOUBLE AS c1 FROM b2 GROUP BY w1),
        per AS (SELECT id, count(*)::BIGINT AS n_bigrams,
                  sum(-log2(c2 / c1)) / count(*) AS avgb
                FROM b2 JOIN c2 USING (bg) JOIN c1 USING (w1) GROUP BY id)
        SELECT d.doc_id AS id, coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
          round(coalesce(avgb, 0.0) + 1e-9, 4) AS avg_bits
        FROM documents d LEFT JOIN per ON d.doc_id = per.id ORDER BY id"""
}
