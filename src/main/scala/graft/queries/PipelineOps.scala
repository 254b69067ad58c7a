package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.textkit.Skills

/** q104 — the reference's de-facto batch query plan as ONE oracle-gated
  * plan: `parse → skills → salary → dedup → sectors`
  * (processing_spark_dag.py:159), executed through the REAL
  * orchestration ([[graft.pipeline.JobPipeline.enrich]]) over a blob
  * corpus synthesized from `orders` (round-15 verdict item 3). Every
  * stage was already gated in isolation (q60/q61/q51/q52, q06/q07);
  * this row pins their COMPOSITION — the inter-stage column contracts,
  * the dedup staging boundary (plan-pinned in PlanContractSpec), and
  * the keep-best survivor semantics — against an independent DuckDB
  * re-derivation built from the same catalogs the Catalyst kernels use.
  *
  * Corpus design (all branches replayable analytically, q51/q60 style;
  * j = o_orderkey div 10 over the `o_orderkey % 10 = 0` subset):
  *  - page shape ∈ q60's b0/b3/b5 (the three ASCII-location shapes —
  *    Abidjan/Daloa/Korhogo; Bouaké and the Côte d'Ivoire default stay
  *    q60's domain: DuckDB's RE2 `\w` is ASCII-only, so the dedup
  *    stage's (?U)\w normalization would diverge on accented tokens);
  *  - duplicate PAIRS: rows with j % 12 < 2 share title root
  *    j - (j % 2) (and shape/company/location with it) — similarity
  *    1.0, so the dedup stage must drop exactly one of each pair;
  *    sources rotate j % 4 over the priority catalog, so the keep-best
  *    winner is decided by source priority (completeness ties: both
  *    pair members carry salary text by construction);
  *  - salary family m = j % 3: "salaire: <amt> fcfa" (conf 0.8) /
  *    "entre <amt> et <amt2> fcfa" (range, conf 0.9) / no span → F18
  *    none + F19 inference miss (title has no grid keyword) → nulls,
  *    source 'none' — q51 owns the full family grid;
  *  - skill suffixes rotate q61's catalog-rich stacks through the
  *    description, so F8 ∪ NLP skill union varies per row;
  *  - requirements present on EVERY row (unlike q60's b-split):
  *    Parse's null-backfill literal contains 'spécifiées', and the
  *    é would sit inside the NLP cleaning regex's ASCII/unicode gap.
  */
object PipelineOps {

  private val Sources = Seq("educarriere", "macarrierepro", "emploi_ci", "linkedin")
  private val Clock = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private val Locations = Seq("Abidjan", "Daloa", "Korhogo")

  private def q104(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = graft.Engine.spread(table(s, dir, "orders"))
      .where($"o_orderkey" % 10 === 0)
      .select(
        $"o_orderkey".cast("long").as("id"),
        $"o_totalprice".cast("long").as("amt"),
        expr("CAST(o_orderkey AS BIGINT) div 10").as("j"))
      .withColumn("r", when($"j" % 12 < 2, $"j" - ($"j" % 2)).otherwise($"j"))
      .withColumn("m", $"j" % 3)
      .withColumn("amt2", $"amt" + ($"j" % 97) * 1000 + 1000)

    val title = concat(lit("Offre numero "), ($"r" * 10).cast("string"))
    val company = element_at(typedLit(KernelOps.Companies), ($"r" % 4).cast("int") + 1)
    val shape = ($"r" % 3).cast("int")
    val sal = when($"m" === 0, concat(
        lit("""<span class="salary">salaire: """), $"amt".cast("string"), lit(" fcfa</span>")))
      .when($"m" === 1, concat(
        lit("""<span class="salary">entre """), $"amt".cast("string"),
        lit(" et "), $"amt2".cast("string"), lit(" fcfa</span>")))
      .otherwise(lit(""))
    val desc = concat(lit("""<div class="description">""" + KernelOps.DescText),
      element_at(typedLit(KernelOps.SkillSuffixes), ($"j" % 5).cast("int") + 1),
      lit("</div>"))
    val reqs = lit("""<ul class="requirements">""" + KernelOps.ReqText + "</ul>")
    val contract = when($"j" % 7 === 6, lit(""))
      .otherwise(concat(lit("<p>type: "),
        element_at(typedLit(KernelOps.ContractMarkers), ($"j" % 7).cast("int") + 1),
        lit("</p>")))
    val htmlCore = when(shape === 0, concat(
        lit("""<div><h1 class="job-title">"""), title, lit("</h1>"),
        lit("""<div class="company-name">"""), company, lit("</div>"),
        lit("""<span class="location">Abidjan</span>"""), sal, lit("</div>")))
      .when(shape === 1, concat(
        lit("<h1>x</h1><title>"), title, lit("</title> chez "), company, lit(","),
        sal, lit("""<span class="location">Daloa</span>""")))
      .otherwise(concat(
        lit("""<h1 class="job-title">"""), title, lit("</h1>"),
        lit("""<div class="employer">"""), company, lit("</div>"),
        lit("""<span class="location">Korhogo</span>"""), sal))
    val meta = concat(lit("""{"job_id": "J"""), lpad($"id".cast("string"), 10, "0"),
      lit("\", \"source\": \""),
      element_at(typedLit(Sources), ($"j" % 4).cast("int") + 1), lit("\"}"))
    val blobs = base.select(
      concat(meta, lit("\n\n"), htmlCore, desc, reqs, contract).as("value"))

    val enriched = new graft.pipeline.JobPipeline(s, "unused-lake-root", Some(Clock))
      .enrich(blobs)
    enriched.select(
      $"job_id", $"source", $"title", $"company", $"location", $"contract_type",
      // sorted join: array_union's order is F8-then-NLP first-occurrence,
      // which DuckDB's list_distinct does not guarantee to preserve —
      // the SET is the contract here, the order is q61's
      concat_ws(",", array_sort($"skills")).as("skills_sorted"),
      size($"skills").cast("long").as("n_skills"),
      roundSafe($"completeness_score", 4).as("completeness"),
      $"salary_min_fcfa".cast("long").as("salary_min_fcfa"),
      $"salary_max_fcfa".cast("long").as("salary_max_fcfa"),
      roundSafe($"salary_avg_fcfa".cast("double"), 2).as("salary_avg_fcfa"),
      $"salary_currency_original".as("currency_original"),
      $"salary_period".as("period_normalized"),
      roundSafe($"salary_confidence".cast("double"), 6).as("salary_confidence"),
      $"salary_source",
      $"secteur_id", $"secteur_nom", $"categorie_parent",
      roundSafe($"sector_confidence".cast("double"), 6).as("sector_confidence"))
      .orderBy($"job_id")
  }

  /** SQL list of F8 parse-catalog skill hits over lowered-text expr
    * `lo` — generated from [[Skills.parseCatalog]] (catalog order,
    * title-cased), exactly the hits-array-then-filter shape of
    * [[Skills.extractSkills]]. */
  private[queries] def sqlF8Skills(lo: String): String = {
    val hits = Skills.parseCatalog.map { v =>
      s"CASE WHEN contains($lo, ${KernelOps.sqlLit(v)}) THEN ${KernelOps.sqlLit(Skills.pythonTitle(v))} END"
    }
    s"list_filter([${hits.mkString(",\n            ")}], x -> x IS NOT NULL)"
  }

  /** SQL list of F15 NLP skill hits over CLEANED-text expr `clean` —
    * generated from [[Skills.nlpCatalog]] + [[Skills.nlpPatterns]],
    * the same sources [[Skills.extractSkillsNlp]] compiles (q61's
    * machinery, list-shaped). */
  private def sqlNlpSkills(clean: String): String = {
    val catalogHits = Skills.nlpCatalog.map { case (cat, variants) =>
      val name = KernelOps.sqlLit(Skills.pythonTitle(cat.replace('_', ' ')))
      val cond = variants.map(v => s"contains($clean, ${KernelOps.sqlLit(v)})").mkString(" OR ")
      s"CASE WHEN $cond THEN $name END"
    }
    val patternHits = Skills.nlpPatterns.map { p =>
      val ext = s"nullif(regexp_extract($clean, ${KernelOps.sqlLit(p)}, 1), '')"
      s"""CASE WHEN $ext IS NOT NULL
            THEN upper(substring(replace($ext, '.', ''), 1, 1))
                 || substring(replace($ext, '.', ''), 2) END"""
    }
    s"list_filter([${(catalogHits ++ patternHits).mkString(",\n            ")}], x -> x IS NOT NULL)"
  }

  private val q104Sql = {
    val sourcesSql = Sources.map(KernelOps.sqlLit).mkString("[", ", ", "]")
    val companiesSql = KernelOps.Companies.map(KernelOps.sqlLit).mkString("[", ", ", "]")
    val locationsSql = Locations.map(KernelOps.sqlLit).mkString("[", ", ", "]")
    val suffixesSql = KernelOps.SkillSuffixes.map(KernelOps.sqlLit).mkString("[", ", ", "]")
    val contractsSql = Seq("CDI", "CDD", "Stage", "Freelance", "Alternance", "Mission")
      .map(KernelOps.sqlLit).mkString("[", ", ", "]")
    val descLit = KernelOps.sqlLit(KernelOps.DescText)
    val reqLit = KernelOps.sqlLit(KernelOps.ReqText)
    // F11 similarity key: first 3 title + 2 company + 1 location
    // normalized tokens (q32's replay shape)
    val simParts = s"""(${DomainOps.sqlNormToks("title")}[1:3] ||
            ${DomainOps.sqlNormToks("company")}[1:2] ||
            ${DomainOps.sqlNormToks("location")}[1:1])"""
    val witness = "job_id, source, title, company, location, contract_type, " +
      "skills, completeness, mn0, mx0, conf, dsource"
    s"""WITH base AS (
          SELECT CAST(o_orderkey AS BIGINT) AS id, trunc(o_totalprice)::BIGINT AS amt,
                 CAST(o_orderkey AS BIGINT) // 10 AS j
          FROM orders WHERE CAST(o_orderkey AS BIGINT) % 10 = 0),
        d AS (
          SELECT id, amt, j,
                 CASE WHEN j % 12 < 2 THEN j - (j % 2) ELSE j END AS r,
                 j % 3 AS m, amt + (j % 97) * 1000 + 1000 AS amt2
          FROM base),
        rowf AS (
          SELECT id, j, m, amt, amt2,
            'J' || lpad(id::VARCHAR, 10, '0') AS job_id,
            $sourcesSql[(j % 4) + 1] AS source,
            'Offre numero ' || (r * 10) AS title,
            $companiesSql[(r % 4) + 1] AS company,
            $locationsSql[(r % 3) + 1] AS location,
            $descLit || $suffixesSql[(j % 5) + 1] AS description,
            $reqLit || ' ' || $reqLit AS requirements,
            CASE WHEN j % 7 = 6 THEN 'Non spécifié'
                 ELSE $contractsSql[(j % 7) + 1] END AS contract_type
          FROM d),
        ctx AS (
          SELECT *, lower(description) AS lo8,
            regexp_replace(regexp_replace(
              lower(concat_ws(' ', description, coalesce(requirements, ''))),
              '[^\\w\\s]', ' ', 'g'), '\\s+', ' ', 'g') AS clean
          FROM rowf),
        sk AS (
          SELECT *, list_sort(list_distinct(
            ${sqlF8Skills("lo8")} || ${sqlNlpSkills("clean")})) AS skills
          FROM ctx),
        sal AS (
          SELECT *,
            CASE WHEN m = 0 THEN amt WHEN m = 1 THEN amt END AS mn0,
            CASE WHEN m = 0 THEN amt WHEN m = 1 THEN amt2 END AS mx0,
            CASE WHEN m = 0 THEN 0.8::DOUBLE WHEN m = 1 THEN 0.9::DOUBLE
                 ELSE 0.0::DOUBLE END AS conf,
            CASE WHEN m = 2 THEN 'none' ELSE 'parsed' END AS dsource,
            -- F12 completeness: title/company/description/location/skills
            -- checks all pass by construction; only salary-text varies
            (5 + CASE WHEN m < 2 THEN 1 ELSE 0 END) / 6.0 AS completeness
          FROM sk),
        keyed AS (
          SELECT *, CASE WHEN len($simParts) = 0 THEN 'UNKNOWN'
                         ELSE array_to_string($simParts, '_') END AS simkey
          FROM sal),
        grp AS (
          SELECT *, count(*) OVER (PARTITION BY simkey) AS gn,
            row_number() OVER (PARTITION BY simkey
              ORDER BY completeness DESC,
                CASE lower(source) WHEN 'educarriere' THEN 4
                     WHEN 'macarrierepro' THEN 3 WHEN 'emploi_ci' THEN 2
                     WHEN 'linkedin' THEN 1 ELSE 0 END DESC,
                job_id) AS rn
          FROM keyed),
        surv AS (SELECT * FROM grp WHERE gn = 1 OR rn = 1),
        f AS (
          SELECT $witness,
            lower(title || ' ' || company || ' ' || description || ' ' || location) AS ftxt,
            lower(title) AS titlelo
          FROM surv),
        ${KernelOps.sectorFoldCtes("f", witness)}
        SELECT job_id, source, title, company, location, contract_type,
          array_to_string(skills, ',') AS skills_sorted,
          len(skills)::BIGINT AS n_skills,
          round(completeness + 1e-9, 4) AS completeness,
          mn0 AS salary_min_fcfa, mx0 AS salary_max_fcfa,
          round((CASE WHEN mn0 IS NOT NULL
                  THEN ((mn0::DOUBLE + mx0::DOUBLE) / 2.0)::REAL::DOUBLE END) + 1e-9, 2)
            AS salary_avg_fcfa,
          'FCFA' AS currency_original, 'monthly' AS period_normalized,
          round(conf::REAL::DOUBLE + 1e-9, 6) AS salary_confidence,
          dsource AS salary_source,
          ${KernelOps.sectorPickSql(_.id, "SECT_INCONNU")} AS secteur_id,
          ${KernelOps.sectorPickSql(_.nom, "Secteur inconnu")} AS secteur_nom,
          ${KernelOps.sectorPickSql(_.parent, "INCONNU")} AS categorie_parent,
          round(bc::DOUBLE + 1e-9, 6) AS sector_confidence
        FROM ${KernelOps.sectorLastCte} ORDER BY job_id"""
  }

  val all: Seq[Q] = Seq(
    Q("q104_pipeline_composite", q104 _, Some(q104Sql)))
}
