package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.matching.Matching
import graft.textkit.Ids

/** Driver-oracle coverage for the namesake offer x CV matching join
  * (J3) — the spec-derived [[graft.matching.Matching]] pipeline
  * (weights: PLAN_REALISATION.md:338-345, output table:
  * NEXT_STEPS.md:182-192) exercised over the driver's test tables.
  *
  * Offer-like rows derive deterministically from `part` (skills = the
  * part-name words through the F24 competence-id generator), CV-like
  * rows from `customer` (skills = every part-name word the customer
  * ever ordered — orders ⋈ lineitem ⋈ part, collect_set). Sector and
  * location block keys are key-mod derivations so the blocked union
  * join has real (and overlapping) block structure; salary grids are
  * chosen so every match ratio terminates well inside round-6 (no
  * cross-engine half-rounding hazard).
  *
  * Three driver gates share the derivation:
  *  - q50: exact blocked matching (maxBlockSize off);
  *  - q95: the SKEW-CAPPED path (maxBlockSize on) — the dial q50
  *    leaves at its default, oracle-replayed via the deterministic
  *    sub-block construction ([[graft.operators.Skew.capBlocks]]:
  *    rank-within-block / cap = sub-block index, same-index sub-blocks
  *    pair) which is plain window SQL;
  *  - q101: the SORT-FREE capped path
  *    ([[graft.operators.Skew.capBlocksHashed]]) — sub-block by a
  *    portable integer hash of the side's id instead of rank, the
  *    giant-block profile where one block's sort would not fit a task.
  */
object MatchOps {

  /** q95's cap: small enough that sector blocks (~36 offers / ~54 CVs
    * per block at sf0.01) split into several sub-blocks on every SF
    * the driver runs, so the capped path differs from q50's exact
    * answer and the oracle really pins the sub-block semantics. */
  private val CapSize = 20

  /** SQL fragment: F24 competence id of expr `e` (lower, ' '/'-' ->
    * '_', first 20 — load_to_bigquery.py:73-78). */
  private[queries] def sqlCompId(e: String): String =
    s"'COMP_' || substring(replace(replace(lower($e), ' ', '_'), '-', '_'), 1, 20)"

  private def offersDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "part")
      .where($"p_partkey" % 8 === 0) // eighth of parts post offers
      .select(
        $"p_partkey".as("offre_id"),
        concat(lit("LOC_"), ($"p_partkey" % 10).cast("string")).as("localisation_id"),
        concat(lit("SECT_"), ($"p_partkey" % 7).cast("string")).as("secteur_id"),
        transform(split($"p_name", " "), w => Ids.competenceId(w)).as("competences_ids"),
        (($"p_partkey" % 15 + 1) * 50000).as("salaire_max"),
        when($"p_size" % 4 === 0, "Débutant")
          .when($"p_size" % 4 === 1, "Intermédiaire")
          .when($"p_size" % 4 === 2, "Senior")
          .otherwise("Non spécifié").as("niveau_experience"))
  }

  private def cvsDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // CV skill profile = distinct competence ids over everything the
    // customer ordered; one shuffle (the groupBy), joins are plain FK
    // equi-joins Catalyst plans with AQE. Two r17-optimization moves
    // (guide §2.3 — compute on the small side, shuffle/explode narrow
    // results), both output-identical:
    //  - the split + F24 competence-id kernel runs ONCE PER PART
    //    (20k rows at sf0.1) on the dimension side and the id array
    //    rides the broadcast join, instead of once per exploded
    //    lineitem word (~3M kernel evaluations); collect_set
    //    re-distincts across parts, so the per-customer set is the
    //    same either way;
    //  - the job-seeker filter (c_custkey % 4 below) is pushed to the
    //    TOP of the profile build: the left join can never resurrect
    //    the other three quarters of customers, and Catalyst does not
    //    propagate the left side's key filter through a left join —
    //    without it the explode/agg built 4x the profiles the query
    //    keeps.
    // Engine.spread between the join and the explode: AQE coalesces
    // the small join output toward one partition, which would run the
    // explode + partial collect_set single-core (the per-row kernel
    // invariant, SCALE.md) — spreading the narrow rows is far cheaper
    // than serializing the exploded aggregation.
    val partComp = table(s, dir, "part").select($"p_partkey",
      array_distinct(transform(split($"p_name", " "), w => Ids.competenceId(w)))
        .as("pcomp"))
    val cvSkills = graft.Engine.spread(table(s, dir, "orders")
      .where($"o_custkey" % 4 === 0)
      .join(table(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .join(partComp, $"l_partkey" === $"p_partkey")
      .select($"o_custkey", $"pcomp"))
      // plain explode, EXEMPT from the repo's explode_outer+null-filter
      // invariant for expensive computed arrays: the filter
      // InferFiltersFromGenerate derives (size(pcomp) > 0 etc.) can
      // only push down to the 20k-row part DIMENSION side where the
      // kernel runs once per part — never below the join onto the
      // per-lineitem stream — so the hazard the invariant guards
      // against (re-evaluating the array expression per joined row)
      // cannot arise here (r17 ADVICE: document the exemption)
      .select($"o_custkey", explode($"pcomp").as("cid"))
      .groupBy($"o_custkey")
      .agg(collect_set($"cid").as("competences_ids"))
    table(s, dir, "customer")
      .where($"c_custkey" % 4 === 0) // quarter of customers seek jobs
      .join(cvSkills, $"c_custkey" === $"o_custkey", "left")
      .select(
        $"c_custkey".as("cv_id"),
        concat(lit("LOC_"), ($"c_custkey" % 10).cast("string")).as("localisation_souhaitee_id"),
        concat(lit("SECT_"), ($"c_custkey" % 7).cast("string")).as("secteur_souhaite_id"),
        $"competences_ids",
        (($"c_custkey" % 8 + 1) * 100000).as("salaire_souhaite"),
        ($"c_custkey" % 12).as("annees_experience"))
  }

  private def presentTopK(s: SparkSession, scores: DataFrame): DataFrame = {
    import s.implicits._
    Matching.topKPerCandidate(scores, 5)
      .select($"candidate_id", $"job_id", $"match_score", $"skill_match_pct",
        $"salary_match_pct", $"location_match_pct", $"rank".cast("long").as("rank"))
      .orderBy($"candidate_id", $"rank")
  }

  private def q50(s: SparkSession, dir: String): DataFrame =
    presentTopK(s, Matching.score(offersDf(s, dir), cvsDf(s, dir)))

  private def q95(s: SparkSession, dir: String): DataFrame =
    presentTopK(s, Matching.score(offersDf(s, dir), cvsDf(s, dir),
      clock = None, maxBlockSize = Some(CapSize)))

  private def q101(s: SparkSession, dir: String): DataFrame =
    presentTopK(s, Matching.score(offersDf(s, dir), cvsDf(s, dir),
      clock = None, maxBlockSize = Some(CapSize), hashedSubBlocks = true))

  /** Shared CTE prefix: the offer/CV derivations. */
  private val baseCtes =
    s"""offers AS (
          SELECT p_partkey AS job_id,
                 'LOC_' || (p_partkey % 10) AS o_loc,
                 'SECT_' || (p_partkey % 7) AS o_sect,
                 list_transform(string_split(p_name, ' '), w -> ${sqlCompId("w")}) AS o_comp,
                 (p_partkey % 15 + 1) * 50000 AS o_sal_max,
                 CASE (p_size % 4) WHEN 0 THEN 'Débutant' WHEN 1 THEN 'Intermédiaire'
                      WHEN 2 THEN 'Senior' ELSE 'Non spécifié' END AS o_level
          FROM part WHERE p_partkey % 8 = 0),
        cvsk AS (
          SELECT o_custkey AS k, list_distinct(list(${sqlCompId("w")})) AS comp
          FROM (SELECT o_custkey, unnest(string_split(p_name, ' ')) AS w
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                     JOIN part ON l_partkey = p_partkey)
          GROUP BY o_custkey),
        cvs AS (
          SELECT c_custkey AS candidate_id,
                 'LOC_' || (c_custkey % 10) AS c_loc,
                 'SECT_' || (c_custkey % 7) AS c_sect,
                 comp AS c_comp,
                 (c_custkey % 8 + 1) * 100000 AS c_sal,
                 (c_custkey % 12) AS c_years
          FROM customer LEFT JOIN cvsk ON c_custkey = k
          WHERE c_custkey % 4 = 0)"""

  /** Shared scoring/ranking tail over a `cand(job_id, candidate_id)`
    * CTE — the component formulas of [[Matching]] verbatim. */
  private val scoreTail =
    """scored AS (
          SELECT job_id, candidate_id,
            CASE WHEN c.c_comp IS NULL OR len(list_distinct(c.c_comp)) = 0 THEN 0.0
                 ELSE len(list_intersect(list_distinct(o.o_comp), list_distinct(c.c_comp)))::DOUBLE
                      / len(list_distinct(c.c_comp))::DOUBLE END AS skill_pct,
            CASE WHEN o.o_loc IS NOT NULL AND o.o_loc = c.c_loc THEN 1.0 ELSE 0.0 END AS loc_pct,
            CASE WHEN c.c_sal IS NULL OR c.c_sal <= 0 THEN 0.0
                 WHEN o.o_sal_max IS NULL THEN 0.0
                 WHEN o.o_sal_max >= c.c_sal THEN 1.0
                 ELSE greatest(0.0, o.o_sal_max::DOUBLE / c.c_sal::DOUBLE) END AS sal_pct,
            CASE WHEN o.o_level = 'Non spécifié' OR o.o_level IS NULL THEN 1.0
                 WHEN c.c_years IS NULL THEN 0.0
                 ELSE greatest(0.0, 1.0 - (CASE
                    WHEN c.c_years < (CASE o.o_level WHEN 'Débutant' THEN 0
                         WHEN 'Intermédiaire' THEN 3 WHEN 'Senior' THEN 5 ELSE 0 END)
                    THEN (CASE o.o_level WHEN 'Débutant' THEN 0
                         WHEN 'Intermédiaire' THEN 3 WHEN 'Senior' THEN 5 ELSE 0 END) - c.c_years
                    WHEN c.c_years > (CASE o.o_level WHEN 'Débutant' THEN 2
                         WHEN 'Intermédiaire' THEN 5 WHEN 'Senior' THEN 100 ELSE 100 END)
                    THEN c.c_years - (CASE o.o_level WHEN 'Débutant' THEN 2
                         WHEN 'Intermédiaire' THEN 5 WHEN 'Senior' THEN 100 ELSE 100 END)
                    ELSE 0 END)::DOUBLE / 5.0) END AS exp_pct
          FROM cand JOIN offers o USING (job_id) JOIN cvs c USING (candidate_id)),
        final AS (
          SELECT job_id, candidate_id,
            round((skill_pct * 0.4 + loc_pct * 0.2 + sal_pct * 0.2 + exp_pct * 0.2) + 1e-9, 6)
              AS match_score,
            round(skill_pct + 1e-9, 6) AS skill_match_pct,
            round(sal_pct + 1e-9, 6) AS salary_match_pct,
            round(loc_pct + 1e-9, 6) AS location_match_pct
          FROM scored),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY candidate_id
              ORDER BY match_score DESC, job_id) AS rank
          FROM final)
        SELECT candidate_id, job_id, match_score, skill_match_pct,
               salary_match_pct, location_match_pct, rank::BIGINT AS rank
        FROM ranked WHERE rank <= 5 ORDER BY candidate_id, rank"""

  private val q50Sql =
    s"""WITH $baseCtes,
        cand AS (
          SELECT DISTINCT job_id, candidate_id FROM (
            SELECT o.job_id, c.candidate_id FROM offers o JOIN cvs c ON o.o_sect = c.c_sect
            UNION ALL
            SELECT o.job_id, c.candidate_id FROM offers o JOIN cvs c ON o.o_loc = c.c_loc)),
        $scoreTail"""

  /** q95 oracle: capBlocks' sub-block key — rank within block by the
    * side's id, (rank-1)//cap = sub-block index, key "<block>#<i>" —
    * replayed as window SQL on each of the four (side x block-key)
    * combinations; only same-index sub-blocks pair. */
  /** Rank-mode sub-block key. NULLS FIRST pins DuckDB to Spark's
    * window default (Window.orderBy is ASC NULLS FIRST; DuckDB's
    * default is NULLS LAST) — with a null id in an over-cap block the
    * two engines would otherwise rank it at opposite ends and shift
    * every other row's sub-block index by one. (Duplicate ids —
    * including two-plus nulls per block — stay outside capBlocks'
    * documented determinism precondition; hashed mode is the dial for
    * those.) */
  private def cappedSide(src: String, block: String, id: String): String =
    s"""SELECT *, $block || '#' ||
          CAST((row_number() OVER (PARTITION BY $block ORDER BY $id NULLS FIRST) - 1)
               // $CapSize AS VARCHAR) AS cb
        FROM $src"""

  private val q95Sql =
    s"""WITH $baseCtes,
        cand AS (
          SELECT DISTINCT job_id, candidate_id FROM (
            SELECT o.job_id, c.candidate_id
            FROM (${cappedSide("offers", "o_sect", "job_id")}) o
            JOIN (${cappedSide("cvs", "c_sect", "candidate_id")}) c ON o.cb = c.cb
            UNION ALL
            SELECT o.job_id, c.candidate_id
            FROM (${cappedSide("offers", "o_loc", "job_id")}) o
            JOIN (${cappedSide("cvs", "c_loc", "candidate_id")}) c ON o.cb = c.cb)),
        $scoreTail"""

  /** q101 oracle: [[graft.operators.Skew.capBlocksHashed]]'s sub-block
    * key replayed verbatim — blocks at or under the cap keep sub-block
    * 0; over-cap rows get the portable Fibonacci mix of the side's id
    * fixed-point-scaled into ceil(n/cap) sub-blocks. Every step is
    * 64-bit integer arithmetic both engines execute identically
    * (DuckDB `//` and Spark `div` both truncate; max intermediate
    * 2^32 * nSub << 2^63). The first fold replays Spark's `pmod` in
    * sign-safe form — `((x % m) + m) % m` — and null ids fold to 0,
    * both identical to the plain `$id % m` the driver ids exercise
    * (non-negative, non-null) but matching the operator exactly if a
    * regeneration ever ships signed pre-hashed or nullable ids. */
  private def hashedSide(src: String, block: String, id: String): String =
    s"""SELECT *, $block || '#' || CAST(
          CASE WHEN n <= $CapSize THEN 0
               ELSE ((((((coalesce(CAST($id AS BIGINT), 0) % 2147483648) + 2147483648)
                        % 2147483648) * 2654435761) % 4294967296)
                     * (((n - 1) // $CapSize) + 1)) // 4294967296 END
          AS VARCHAR) AS cb
        FROM (SELECT *, count(*) OVER (PARTITION BY $block) AS n FROM $src)"""

  private val q101Sql =
    s"""WITH $baseCtes,
        cand AS (
          SELECT DISTINCT job_id, candidate_id FROM (
            SELECT o.job_id, c.candidate_id
            FROM (${hashedSide("offers", "o_sect", "job_id")}) o
            JOIN (${hashedSide("cvs", "c_sect", "candidate_id")}) c ON o.cb = c.cb
            UNION ALL
            SELECT o.job_id, c.candidate_id
            FROM (${hashedSide("offers", "o_loc", "job_id")}) o
            JOIN (${hashedSide("cvs", "c_loc", "candidate_id")}) c ON o.cb = c.cb)),
        $scoreTail"""

  val all: Seq[Q] = Seq(
    Q("q50_matching_scores", q50 _, Some(q50Sql)),
    Q("q95_matching_capped", q95 _, Some(q95Sql)),
    Q("q101_matching_capped_hash", q101 _, Some(q101Sql)))
}
