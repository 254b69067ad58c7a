package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.textkit.{Ids, Normalize}

/** The job-matching domain kernels (normalize / weighted similarity /
  * blocking key — F9-F11; warehouse ID generators — F22-F24) exercised
  * over the driver's test tables with DuckDB oracles. The oracle SQL
  * re-implements the exact normalization pipeline, so the driver gate
  * covers the same Column expressions the pipeline stages use.
  */
object DomainOps {

  private val stopSql = Normalize.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** SQL: normalized token array of expr `e` (F9 pipeline). Test-table
    * text is ASCII so RE2's ASCII \w matches Java's (?U)\w here. */
  private[queries] def sqlNormToks(e: String): String =
    s"""list_filter(
        string_split_regex(regexp_replace(lower($e), '[^\\w\\s]', ' ', 'g'), '\\s+'),
        w -> len(w) > 2 AND NOT list_contains($stopSql, w))"""

  /** F10 weighted similarity over same-nation customer pairs: blocked
    * self-join + native Jaccard scoring (the dedup engine's join form). */
  private def q31(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // normalize ONCE per row (map stage), join on the block, score
    // cheap array ops per pair — the shape that survives 100x data
    val c = table(s, dir, "customer").select(
      $"c_custkey", $"c_nationkey",
      Normalize.simTokensHashed($"c_name").as("toks"),
      Normalize.normText($"c_mktsegment").as("segn"),
      Normalize.normText($"c_nationkey".cast("string")).as("locn"),
      Normalize.simOk($"c_name", $"c_mktsegment", $"c_nationkey".cast("string")).as("ok"))
    // Engine.spread: the blocked self-join emits O(block^2) pairs; the
    // probe side must not run at a single file-split's parallelism
    val a = graft.Engine.spread(c.select($"c_custkey".as("k1"), $"c_nationkey".as("nk"),
      $"toks".as("toks1"), $"segn".as("segn1"), $"locn".as("locn1"), $"ok".as("ok1")))
    val b = c.select($"c_custkey".as("k2"), $"c_nationkey".as("nkb"),
      $"toks".as("toks2"), $"segn".as("segn2"), $"locn".as("locn2"), $"ok".as("ok2"))
    a.join(b, $"nk" === $"nkb" && $"k1" < $"k2")
      .withColumn("score", round(Normalize.similarityScorePrepped(
        $"toks1", $"segn1", $"locn1", $"ok1",
        $"toks2", $"segn2", $"locn2", $"ok2"), 6))
      .where($"score" >= 0.5)
      .select($"nk".cast("long").as("nationkey"), $"k1", $"k2", $"score")
      .orderBy($"nationkey", $"k1", $"k2")
  }

  private val q31Sql =
    s"""WITH c AS (SELECT c_custkey, c_mktsegment, c_nationkey,
                   list_distinct(${sqlNormToks("c_name")}) AS toks
                   FROM customer)
        SELECT nationkey, k1, k2, score FROM (
          SELECT a.c_nationkey::BIGINT AS nationkey,
                 a.c_custkey AS k1, b.c_custkey AS k2,
                 round(0.5 * (len(list_intersect(a.toks, b.toks))::DOUBLE /
                              len(list_distinct(a.toks || b.toks)))
                     + 0.3 * (CASE WHEN a.c_mktsegment = b.c_mktsegment
                                   THEN 1.0 ELSE 0.0 END)
                     + 0.2, 6) AS score
          FROM c a JOIN c b
            ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey) x
        WHERE score >= 0.5 ORDER BY nationkey, k1, k2"""

  /** F11 blocking key + F24 competence id over parts. */
  private def q32(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "part")
      .select(
        $"p_partkey",
        Normalize.similarityKey($"p_name", $"p_brand", $"p_type").as("sim_key"),
        Ids.competenceId($"p_name").as("comp_id"),
        Normalize.normText($"p_name").as("norm_name"))
      .orderBy($"p_partkey")
  }

  private val q32Sql =
    s"""WITH p AS (SELECT p_partkey,
          ${sqlNormToks("p_name")} AS tn,
          ${sqlNormToks("p_brand")} AS tb,
          ${sqlNormToks("p_type")} AS tt
        FROM part)
        SELECT p_partkey,
          CASE WHEN len(tn[1:3] || tb[1:2] || tt[1:1]) = 0 THEN 'UNKNOWN'
               ELSE array_to_string(tn[1:3] || tb[1:2] || tt[1:1], '_') END AS sim_key,
          'COMP_' || substring(replace(replace(lower(p_name), ' ', '_'), '-', '_'), 1, 20)
            AS comp_id,
          array_to_string(tn, ' ') AS norm_name
        FROM p JOIN part USING (p_partkey)
        ORDER BY p_partkey"""

  /** F22/F23 warehouse ID generators over customer x nation. */
  private def q33(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "customer")
      .join(broadcast(table(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .select(
        $"c_custkey",
        Ids.entrepriseId($"c_name").as("ent_id"),
        Ids.localisationId($"n_name").as("loc_id"))
      .orderBy($"c_custkey")
  }

  private val q33Sql =
    """SELECT c_custkey,
       'ENT_' || substring(regexp_replace(upper(c_name), '[ .-]', '', 'g'), 1, 10)
         AS ent_id,
       'LOC_' || replace(substring(trim(upper(n_name)), 1, 15), ' ', '_') AS loc_id
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       ORDER BY c_custkey"""

  val all: Seq[Q] = Seq(
    Q("q31_similarity_pairs", q31 _, Some(q31Sql)),
    Q("q32_blocking_key", q32 _, Some(q32Sql)),
    Q("q33_warehouse_ids", q33 _, Some(q33Sql)))
}
