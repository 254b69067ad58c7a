package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.functions.TextFunctions
import graft.operators.ZOrder

/** Index-construction surface: inverted index build (q78), token
  * co-occurrence PMI (q79), and Z-order layout statistics (q80). These
  * are the batch-infrastructure ops around retrieval (q70 consumes
  * what q78 builds) and lake layout (q80's interleave is what a
  * ZORDER-clustered write sorts by).
  */
object IndexOps {

  private val MinDf = 10

  /** Inverted index: term → document frequency + sorted postings list.
    * One generate over per-doc DISTINCT token sets (postings are doc
    * lists, not occurrence lists), one shuffle on term. The df floor
    * is the standard long-tail dial: at corpus scale the hapax tail is
    * most of the vocabulary but none of the retrieval value. Postings
    * emit as a comma-joined string — the driver comparator row-sorts
    * on scalar columns. */
  private def q78(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Engine.spread(table(s, dir, "documents"))
    docs
      .select(col("doc_id"), explode_outer(TextFunctions.tokenSet(col("text"))).as("term"))
      .where(col("term").isNotNull)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        concat_ws(",",
          transform(sort_array(collect_set(col("doc_id"))), x => x.cast("string")))
          .as("postings"))
      .where(col("df") >= MinDf)
      .orderBy(col("term"))
  }

  private val q78Sql =
    s"""WITH t AS (SELECT doc_id, unnest(${TextFunctions.sqlTokenSet("text")}) AS term
          FROM documents)
        SELECT term, count(*)::BIGINT AS df,
          string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
        FROM t GROUP BY term HAVING count(*) >= $MinDf ORDER BY term"""

  private val MinPairDf = 5

  private val PmiVocabCap = 5000

  /** Pointwise mutual information over token pairs co-occurring in a
    * document: pmi(a,b) = ln(df_ab · N / (df_a · df_b)). The pair space
    * is the per-document distinct-token self-join — quadratic in DOC
    * vocabulary, never in corpus vocabulary — and is additionally
    * restricted to the top-V terms by document frequency BEFORE
    * pairing (TakeOrdered cut + broadcast semi-join, the standard
    * collocation-pipeline dial: the ScaleProbe corpus shows uncapped
    * pair counts growing into the 10^8 range at 10^5 docs while the
    * informative pairs all sit in the df head). Marginals and the doc
    * count broadcast back; the df_ab floor cuts the residual tail. */
  private def q79(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Engine.spread(table(s, dir, "documents"))
    // Staged once (r17 optimization): the distinct-token stream feeds
    // the df counts, BOTH pair-join sides, and the marginal join — and
    // the two semi-join consumers each re-derived the tokenize cascade
    // plus the whole vocab subtree under it, so the before-plan
    // scanned the corpus 8 times (plans/r17/q79_token_pmi_before.txt).
    // Every consumer now reads one narrow stat-bearing parquet leaf
    // (the minhashLshPairs staging rationale, SCALE.md round-8); the
    // vocab TakeOrdered cut stays a plan subtree (PlanContractSpec
    // pins it), re-run per consumer over the staged rows — three cheap
    // aggregations instead of three cascade re-derivations.
    val dtAll = graft.operators.Scratch.stage(docs
      .select(col("doc_id"), explode_outer(TextFunctions.tokenSet(col("text"))).as("term"))
      .where(col("term").isNotNull), "graft-pmi-toks")
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val dfsAll = dtAll.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val vocab = dfsAll.orderBy(col("c").desc, col("term")).limit(PmiVocabCap)
    val dt = dtAll.join(broadcast(vocab.select(col("term"))), Seq("term"), "left_semi")
    val dfs = dfsAll.join(broadcast(vocab.select(col("term"))), Seq("term"), "left_semi")
    val pairs = dt.select(col("doc_id"), col("term").as("ta"))
      .join(dt.select(col("doc_id"), col("term").as("tb")), "doc_id")
      .where(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= MinPairDf)
    pairs
      .join(broadcast(dfs.select(col("term").as("ta"), col("c").as("c_a"))), "ta")
      .join(broadcast(dfs.select(col("term").as("tb"), col("c").as("c_b"))), "tb")
      .join(broadcast(nDocs))
      .select(col("ta"), col("tb"), col("c_ab"),
        roundSafe(log((col("c_ab") * col("n")).cast("double") /
          (col("c_a") * col("c_b")).cast("double")), 6).as("pmi"))
      .orderBy(col("ta"), col("tb"))
  }

  // the oracle mirrors the vocab cap exactly (same ordering, same
  // limit) — it is a no-op on the 31-term driver corpus, but the
  // oracle must replay the QUERY's semantics, not a coincidentally
  // equal relaxation of them
  private val q79Sql =
    s"""WITH dta AS (SELECT doc_id, unnest(${TextFunctions.sqlTokenSet("text")}) AS term
          FROM documents),
        n AS (SELECT count(*)::BIGINT AS n FROM documents),
        dfsa AS (SELECT term, count(*)::BIGINT AS c FROM dta GROUP BY 1),
        vocab AS (SELECT term FROM dfsa ORDER BY c DESC, term LIMIT $PmiVocabCap),
        dt AS (SELECT dta.* FROM dta SEMI JOIN vocab USING (term)),
        dfs AS (SELECT dfsa.* FROM dfsa SEMI JOIN vocab USING (term)),
        p AS (SELECT a.term AS ta, b.term AS tb, count(*)::BIGINT AS c_ab
              FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
              GROUP BY 1, 2 HAVING count(*) >= $MinPairDf)
        SELECT ta, tb, c_ab,
          round(ln((c_ab * n.n)::DOUBLE / (da.c * db.c)::DOUBLE) + 1e-9, 6) AS pmi
        FROM p JOIN dfs da ON p.ta = da.term
               JOIN dfs db ON p.tb = db.term
               CROSS JOIN n
        ORDER BY ta, tb"""

  private val ZBits = 16
  private val ZShift = 24

  /** Z-order locality statistics: Morton-interleave (partkey, suppkey),
    * bucket by the z prefix, and report each bucket's per-dimension
    * min/max span. Narrow spans on BOTH columns are exactly the
    * file-skipping property a ZORDER-clustered write buys — this query
    * verifies the interleave arithmetic cross-engine; the physical
    * layout op is [[ZOrder.clusterBy]] (spec-gated: per-partition span
    * assertions). */
  private def q80(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .withColumn("zb", shiftright(
        ZOrder.zValue(col("l_partkey"), col("l_suppkey"), ZBits), ZShift))
      .groupBy(col("zb"))
      .agg(count(lit(1)).as("cnt"),
        min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
        min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
      .orderBy(col("zb"))

  private val q80Sql = {
    // BIGINT-cast ids: bitwise &/>> bind to integral types only, so a
    // DECIMAL(20,0)-typed key regeneration (the canonicalNumerics
    // drift class) dies at the binder without the casts — no-ops today
    val z = ZOrder.sqlZValue("CAST(l_partkey AS BIGINT)", "CAST(l_suppkey AS BIGINT)", ZBits)
    s"""SELECT ($z >> $ZShift) AS zb, count(*)::BIGINT AS cnt,
          min(CAST(l_partkey AS BIGINT)) AS pk_min, max(CAST(l_partkey AS BIGINT)) AS pk_max,
          min(CAST(l_suppkey AS BIGINT)) AS sk_min, max(CAST(l_suppkey AS BIGINT)) AS sk_max
        FROM lineitem GROUP BY 1 ORDER BY 1"""
  }

  val all: Seq[Q] = Seq(
    Q("q78_inverted_index", q78 _, Some(q78Sql)),
    Q("q79_token_pmi", q79 _, Some(q79Sql)),
    Q("q80_zorder_stats", q80 _, Some(q80Sql)))
}
