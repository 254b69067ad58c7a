package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.operators.{BloomJoin, Retrieval}

/** Retrieval + join-pruning surface: BM25 top-k search over the
  * documents corpus (q70) and an explicit Bloom-filter semi-join
  * reduction on the orders⋈lineitem join (q71). Oracles: q70 replays
  * the full BM25 arithmetic in DuckDB from the same tokenizer
  * semantics; q71's oracle is the PLAIN join — the bloom filter has no
  * false negatives and the exact join removes false positives, so
  * pruned and unpruned answers must be identical.
  */
object SearchOps {

  private val Terms = Seq("merge", "window", "batch", "sort")
  private val TopK = 15
  private val K1 = 1.2
  private val B = 0.75

  private def q70(s: SparkSession, dir: String): DataFrame =
    // spread: the corpus tokenize + filter is the per-row kernel cost
    // and a single-file scan would pin it to one core (SCALE.md)
    Retrieval.bm25TopK(graft.Engine.spread(table(s, dir, "documents")),
      "doc_id", "text", Terms, TopK, K1, B)

  private val q70Sql = {
    val termList = Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH t AS (SELECT doc_id,
            list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> len(x) > 0) AS toks
          FROM documents),
        d AS (SELECT doc_id, len(toks)::DOUBLE AS dl, toks FROM t),
        st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM d),
        m AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
        tf AS (SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM m
               WHERE term IN ($termList) GROUP BY 1, 2, 3),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
        sc AS (SELECT doc_id,
                 sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                     * tf * ${K1 + 1.0}
                     / (tf + $K1 * (${1.0 - B} + $B * dl / avgdl))) AS score
               FROM tf JOIN df USING (term) CROSS JOIN st GROUP BY doc_id)
        SELECT doc_id, round(score + 1e-9, 6) AS score FROM sc
        ORDER BY score DESC, doc_id LIMIT $TopK"""
  }

  private val BloomHashes = 4

  /** Bloom-pruned join: urgent orders' keys → bitset → prune lineitem
    * before its shuffle → exact join → monthly revenue. The bitset
    * build is one job over the (filtered, small) build side, run at
    * query execution like any action — its cost is part of the
    * query's real cost, as with q18's Auto probe. The bitset is SIZED
    * from a count of the build side (~10 bits/key): a fixed size
    * saturates as the build side grows and the "pruning" becomes pure
    * overhead (see [[BloomJoin.sizedBits]]); the count is one cheap
    * pushdown-filtered scan of orders. */
  private def q71(s: SparkSession, dir: String): DataFrame = {
    val urgent = table(s, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val filter = BloomJoin.buildBits(urgent, "o_orderkey",
      BloomJoin.sizedBits(urgent.count()), BloomHashes)
    val li = BloomJoin.pruned(table(s, dir, "lineitem"), "l_orderkey", filter)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    urgent.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("month"))
      .agg(count(lit(1)).as("n_items"), roundSafe(sum(col("rev")), 2).as("revenue"))
      .orderBy(col("month"))
  }

  private val q71Sql =
    """SELECT date_trunc('month', o_orderdate)::DATE AS month,
         count(*)::BIGINT AS n_items,
         round(sum(CAST(l_extendedprice AS DOUBLE) * (1.0 - CAST(l_discount AS DOUBLE))) + 1e-9, 2) AS revenue
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       WHERE o_orderpriority = '1-URGENT'
       GROUP BY 1 ORDER BY 1"""

  private val FuzzyPrefix = 16
  private val MaxEdit = 1

  /** Banded fuzzy self-join (entity resolution): candidate pairs come
    * from an equi-join on a cheap blocking key (shared 16-char prefix —
    * same family as q32's similarity key and the LSH band keys), then
    * the exact edit-distance verifies within the block. The quadratic
    * stays inside blocks; levenshtein runs on candidate pairs only,
    * never all-pairs. Probe side spread per the pair-join invariant. */
  private def q89(s: SparkSession, dir: String): DataFrame = {
    val c = table(s, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        substring(col("c_name"), 1, FuzzyPrefix).as("bk"))
    val a = graft.Engine.spread(
      c.select(col("id").as("id_a"), col("name").as("na"), col("bk")))
    val b = c.select(col("id").as("id_b"), col("name").as("nb"), col("bk").as("bkb"))
    a.join(b, col("bk") === col("bkb") && col("id_a") < col("id_b"))
      .withColumn("lev", levenshtein(col("na"), col("nb")).cast("long"))
      .where(col("lev") <= MaxEdit)
      .select(col("id_a"), col("id_b"), col("lev"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val q89Sql =
    s"""WITH c AS (SELECT c_custkey AS id, c_name AS name,
            substring(c_name, 1, $FuzzyPrefix) AS bk FROM customer)
        SELECT a.id AS id_a, b.id AS id_b,
          levenshtein(a.name, b.name)::BIGINT AS lev
        FROM c a JOIN c b ON a.bk = b.bk AND a.id < b.id
        WHERE levenshtein(a.name, b.name) <= $MaxEdit
        ORDER BY id_a, id_b"""

  val all: Seq[Q] = Seq(
    Q("q70_bm25_topk", q70 _, Some(q70Sql)),
    Q("q71_bloom_join", q71 _, Some(q71Sql)),
    Q("q89_fuzzy_join", q89 _, Some(q89Sql)))
}
