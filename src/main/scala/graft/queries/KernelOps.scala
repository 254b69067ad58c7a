package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.textkit.{Salary, Sectors}

/** Driver-oracle coverage for the branchy textkit kernels that were
  * previously golden-spec-only: the F18 salary regex cascade (+F19
  * inference, +F20 normalization — extract_salary.py:71-291) and the
  * F21 sector classifier (extract_sectors.py:48-345).
  *
  * The Spark side runs the REAL kernels (the same UDF/Column code the
  * pipeline stages use) over salary/sector texts synthesized
  * deterministically from the test tables; the DuckDB oracle
  * re-derives the expected output from the same arithmetic — an
  * independent replay, not a re-run of the kernel.
  *
  * Replayed bug-compatible quirks (see Salary.scala / Sectors.scala
  * scaladocs): whole-text currency/period substring detection, BigInt
  * truncating division, float-capped best-confidence comparison in the
  * sector argmax (a raw double score is compared against the CAPPED
  * FLOAT of the current best — ties can flip to a later sector when
  * the float rounds down).
  */
object KernelOps {

  // ---------------------------------------------------------------- q51

  /** Salary texts: seven deterministic pattern families keyed on
    * o_orderkey % 7 — grouped-digit FCFA, EUR yearly, two range forms,
    * negotiable, USD monthly, and a no-match row that falls through to
    * F19 title inference (or to `none`). */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Engine.spread: the test parquet is a single file split, which
    // would serialize the regex-cascade UDF onto one core; the map
    // stage is the whole query, so spread the scan first
    val base = graft.Engine.spread(table(s, dir, "orders")).select(
      $"o_orderkey".as("id"),
      $"o_totalprice".cast("long").as("amt"),
      ($"o_totalprice".cast("long") + ($"o_orderkey" % 97) * 1000 + 1000).as("amt2"),
      ($"o_orderkey" % 7).as("b"), ($"o_orderkey" % 2).as("m2"),
      ($"o_orderkey" % 3).as("m3"))
    // space-grouped digits: parseAmount strips separators, so the
    // re-parsed value equals amt for any magnitude (lpad keeps the
    // low group value-faithful)
    val amtSep = when($"amt" >= 1000,
        concat(($"amt" / 1000).cast("long").cast("string"), lit(" "),
          lpad(($"amt" % 1000).cast("string"), 3, "0")))
      .otherwise($"amt".cast("string"))
    val amtS = $"amt".cast("string"); val amt2S = $"amt2".cast("string")
    val salaryText = when($"b" === 0, concat(lit("salaire: "), amtSep, lit(" fcfa")))
      .when($"b" === 1, concat(amtS, lit(" eur par an")))
      .when($"b" === 2, concat(lit("entre "), amtS, lit(" et "), amt2S, lit(" fcfa")))
      .when($"b" === 3, concat(amtS, lit(" à "), amt2S, lit(" fcfa selon expérience")))
      .when($"b" === 4, concat(amtS, lit(" fcfa négociable")))
      .when($"b" === 5, concat(amtS, lit(" $ par mois")))
      .otherwise(lit(null).cast("string"))
    val title = when($"b" === 6,
        when($"m2" === 0, "développeur senior h/f").otherwise("agent commercial"))
      .otherwise(lit("poste"))
    val location = when($"m2" === 0, "Abidjan").otherwise("Bouaké")
    val contract = when($"m3" === 0, "CDD").otherwise("CDI")

    val parsed = Salary.parseComprehensiveUdf(salaryText, lit(null).cast("string"), title)
    val withParsed = base.withColumn("p", parsed)
      .withColumn("f", // F19: inference only when parse confidence == 0
        when(col("p").getField("confidence") === 0,
          Salary.inferRangeUdf(title, location, contract)).otherwise(col("p")))
    val n = Salary.normalized(col("f"))
    withParsed.select(
      $"id",
      n.getField("salary_min_fcfa").cast("long").as("salary_min_fcfa"),
      n.getField("salary_max_fcfa").cast("long").as("salary_max_fcfa"),
      roundSafe(n.getField("salary_avg_fcfa").cast("double"), 2).as("salary_avg_fcfa"),
      n.getField("currency_original").as("currency_original"),
      n.getField("period_normalized").as("period_normalized"),
      roundSafe(n.getField("confidence_score").cast("double"), 6).as("confidence_score"),
      n.getField("data_source").as("data_source"))
      .orderBy($"id")
  }

  /** Expected values re-derived from the amounts, not re-parsed: the
    * oracle knows which pattern family each branch exercises and
    * applies the cascade's currency (x655 EUR / x600 USD), period
    * (//12 yearly truncating), confidence-modifier, inference-grid
    * (trunc(x*1.2) Abidjan, trunc(x*0.9) CDD — op-for-op IEEE parity)
    * and F20 backfill rules directly. The seed `trunc(o_totalprice)`
    * deliberately takes the RAW column, not CAST(... AS DOUBLE): under
    * a DECIMAL-typed regeneration the exact decimal trunc equals the
    * double trunc (the 18-dp decimal round-trips the double), while
    * DuckDB's decimal→double CAST is not correctly rounded and flips
    * the trunc at integer boundaries (measured: 9 rows at sf0.01). */
  private val q51Sql =
    """WITH base AS (
         SELECT o_orderkey AS id,
           trunc(o_totalprice)::BIGINT AS amt,
           trunc(o_totalprice)::BIGINT
             + (CAST(o_orderkey AS BIGINT) % 97) * 1000 + 1000 AS amt2,
           CAST(o_orderkey AS BIGINT) % 7 AS b, CAST(o_orderkey AS BIGINT) % 2 AS m2,
           CAST(o_orderkey AS BIGINT) % 3 AS m3
         FROM orders),
       p AS (
         SELECT id,
           CASE WHEN b = 0 THEN amt
                WHEN b = 1 THEN (amt * 655) // 12
                WHEN b = 2 THEN amt
                WHEN b = 3 THEN amt
                WHEN b = 4 THEN amt
                WHEN b = 5 THEN amt * 600
                ELSE CASE WHEN m2 = 0 THEN
                       CASE WHEN m3 = 0
                            THEN trunc(trunc(500000 * 1.2::DOUBLE) * 0.9::DOUBLE)::BIGINT
                            ELSE trunc(500000 * 1.2::DOUBLE)::BIGINT END
                     ELSE NULL END END AS mn,
           CASE WHEN b = 0 THEN amt
                WHEN b = 1 THEN (amt * 655) // 12
                WHEN b = 2 THEN amt2
                WHEN b = 3 THEN amt2
                WHEN b = 4 THEN amt
                WHEN b = 5 THEN amt * 600
                ELSE CASE WHEN m2 = 0 THEN
                       CASE WHEN m3 = 0
                            THEN trunc(trunc(1500000 * 1.2::DOUBLE) * 0.9::DOUBLE)::BIGINT
                            ELSE trunc(1500000 * 1.2::DOUBLE)::BIGINT END
                     ELSE NULL END END AS mx,
           CASE WHEN b = 1 THEN 'EUR' WHEN b = 5 THEN 'USD' ELSE 'FCFA' END
             AS currency_original,
           CASE WHEN b = 1 THEN 'yearly' ELSE 'monthly' END AS period_normalized,
           CASE WHEN b = 2 THEN 0.9::DOUBLE
                WHEN b = 3 THEN 0.9::DOUBLE * 0.9::DOUBLE
                WHEN b = 4 THEN 0.8::DOUBLE * 0.8::DOUBLE
                WHEN b = 6 THEN (CASE WHEN m2 = 0 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
                ELSE 0.8::DOUBLE END AS conf,
           CASE WHEN b = 6 THEN (CASE WHEN m2 = 0 THEN 'inferred' ELSE 'none' END)
                ELSE 'parsed' END AS data_source
         FROM base)
       SELECT id, mn AS salary_min_fcfa, mx AS salary_max_fcfa,
         round((CASE WHEN mn IS NOT NULL
                 THEN ((mn::DOUBLE + mx::DOUBLE) / 2.0)::REAL::DOUBLE END) + 1e-9, 2)
           AS salary_avg_fcfa,
         currency_original, period_normalized,
         round(conf::REAL::DOUBLE + 1e-9, 6) AS confidence_score,
         data_source
       FROM p ORDER BY id"""

  // ---------------------------------------------------------------- q52

  /** Sector-classification inputs: titles rotate through four shapes
    * (neutral, transport, health, finance) so several catalog sectors
    * genuinely compete; every fifth doc gets a company-list hit. */
  private def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val title = when($"doc_id" % 4 === 1, "chauffeur livreur")
      .when($"doc_id" % 4 === 2, "infirmier clinique")
      .when($"doc_id" % 4 === 3, "banque audit")
      .otherwise(concat(lit("doc "), $"lang"))
    val company = when($"doc_id" % 5 === 0, "Orange CI").otherwise($"source")
    val location = when($"doc_id" % 2 === 0, "Abidjan").otherwise(lit("Bouaké"))
    val cls = Sectors.classifyUdf(title, company, $"text", location)
    // spread: same single-split serialization guard as q51 — the
    // classifier scans ~400 catalog substrings per row
    graft.Engine.spread(table(s, dir, "documents"))
      .withColumn("c", cls)
      .select($"doc_id",
        col("c").getField("secteur_id").as("secteur_id"),
        col("c").getField("secteur_nom").as("secteur_nom"),
        col("c").getField("categorie_parent").as("categorie_parent"),
        roundSafe(col("c").getField("confidence").cast("double"), 6).as("confidence"))
      .orderBy($"doc_id")
  }

  private[queries] def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The F21 replay, generated from [[Sectors.catalog]] itself so the
    * two sides cannot drift: per-sector raw score
    * min(0.3*kw, 0.8) + 0.5[company] + 0.2*title_kw, then the
    * reference's sequential best-tracking fold (14 chained CTEs — one
    * per catalog sector — each comparing the raw double against the
    * float-capped running best). */
  /** The F21 sector-classifier replay, SHARED between q52 and the q104
    * pipeline composite (round-15): generated from [[Sectors.catalog]]
    * so the SQL and the Catalyst kernel cannot drift. `fromCte` must
    * provide columns `idCols` (comma-joined pass-through keys), `ftxt`
    * (lowered title+company+text+location concat) and `titlelo`.
    * Emits the score CTE plus the reference's sequential
    * best-tracking fold (one CTE per catalog sector, each comparing
    * the raw double score against the FLOAT-capped running best);
    * [[sectorLastCte]] names the final CTE, [[sectorPickSql]] the
    * winner-decode expressions. */
  private[queries] def sectorFoldCtes(fromCte: String, idCols: String): String = {
    val scores = Sectors.catalog.zipWithIndex.map { case (sd, i) =>
      val kws = sd.motsCles.map(sqlLit).mkString("[", ", ", "]")
      val comps = sd.entreprises.map(e => sqlLit(e.toLowerCase)).mkString("[", ", ", "]")
      s"""(CASE WHEN len(list_filter($kws, k -> contains(ftxt, k))) > 0
              THEN least(len(list_filter($kws, k -> contains(ftxt, k))) * 0.3::DOUBLE,
                         0.8::DOUBLE) ELSE 0.0::DOUBLE END
            + CASE WHEN len(list_filter($comps, e -> contains(ftxt, e))) > 0
                   THEN 0.5::DOUBLE ELSE 0.0::DOUBLE END
            + 0.2::DOUBLE * len(list_filter($kws, k -> contains(titlelo, k)))) AS s$i"""
    }
    val n = Sectors.catalog.length
    val foldCtes = (0 until n).map { i =>
      val src = if (i == 0) "sc" else s"st${i - 1}"
      val carry = ((i + 1) until n).map(j => s"s$j").mkString(", ")
      val carrySel = if (carry.isEmpty) "" else s", $carry"
      val prevW = if (i == 0) "-1" else "w"
      val prevBc = if (i == 0) "0.0::REAL" else "bc"
      s"""st$i AS (SELECT $idCols,
            CASE WHEN s$i > $prevBc THEN $i ELSE $prevW END AS w,
            CASE WHEN s$i > $prevBc THEN least(s$i, 1.0::DOUBLE)::REAL ELSE $prevBc END AS bc
            $carrySel FROM $src)"""
    }.mkString(",\n        ")
    s"""sc AS (SELECT $idCols, ${scores.mkString(",\n          ")} FROM $fromCte),
        $foldCtes"""
  }

  private[queries] def sectorLastCte: String = s"st${Sectors.catalog.length - 1}"

  private[queries] def sectorPickSql(f: Sectors.SectorDef => String, unknown: String): String =
    "CASE w " + Sectors.catalog.zipWithIndex.map { case (sd, i) =>
      s"WHEN $i THEN ${sqlLit(f(sd))}"
    }.mkString(" ") + s" ELSE ${sqlLit(unknown)} END"

  private val q52Sql = {
    def pick(f: Sectors.SectorDef => String, unknown: String): String =
      sectorPickSql(f, unknown)
    s"""WITH inp AS (
          SELECT doc_id,
            CASE WHEN doc_id % 4 = 1 THEN 'chauffeur livreur'
                 WHEN doc_id % 4 = 2 THEN 'infirmier clinique'
                 WHEN doc_id % 4 = 3 THEN 'banque audit'
                 ELSE 'doc ' || lang END AS title,
            CASE WHEN doc_id % 5 = 0 THEN 'Orange CI' ELSE source END AS company,
            text,
            CASE WHEN doc_id % 2 = 0 THEN 'Abidjan' ELSE 'Bouaké' END AS loc
          FROM documents),
        f AS (SELECT doc_id,
            lower(title || ' ' || company || ' ' || text || ' ' || loc) AS ftxt,
            lower(title) AS titlelo
          FROM inp),
        ${sectorFoldCtes("f", "doc_id")}
        SELECT doc_id,
          ${pick(_.id, "SECT_INCONNU")} AS secteur_id,
          ${pick(_.nom, "Secteur inconnu")} AS secteur_nom,
          ${pick(_.parent, "INCONNU")} AS categorie_parent,
          round(bc::DOUBLE + 1e-9, 6) AS confidence
        FROM $sectorLastCte ORDER BY doc_id"""
  }

  // ---------------------------------------------------------------- q60

  private[queries] val Companies = Seq("Acme SA", "Ivoire Telecom", "Globex Corp", "Initech SARL")
  private[queries] val ContractMarkers = Seq("cdi", "cdd", "stage", "freelance", "alternance", "mission")

  /** HTML-extraction kernels (F1/F2/F5/F6/F7) over synthesized offer
    * pages: six page shapes (o_orderkey % 6) drive distinct cascade
    * branches — h1.job-title / plain h1 / .offer-title / &lt;title&gt;
    * fallback for the title; selector vs chez-pattern vs confidential
    * default for the company; selector vs city-scan vs country default
    * for the location; salary element vs free-text regex; contract
    * keyword table (o_orderkey % 7, incl. the no-marker default). The
    * oracle re-derives each branch's expected value from the same mods
    * — it never re-parses the HTML. */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.textkit.HtmlExtract
    // Engine.spread: seven regex-cascade UDFs per row on a single-split
    // scan would run one-core (the q51 lesson)
    val base = graft.Engine.spread(table(s, dir, "orders")).select(
      $"o_orderkey".as("id"),
      $"o_totalprice".cast("long").as("amt"),
      ($"o_orderkey" % 6).as("b"), ($"o_orderkey" % 7).as("m"),
      ($"o_orderkey" % 4).as("cmod"), ($"o_orderkey" % 2).as("par"))
    val title = concat(lit("Offre numero "), $"id".cast("string"))
    val company = element_at(typedLit(Companies), ($"cmod" + 1).cast("int"))
    val sal = when($"par" === 0,
        concat(lit("""<span class="salary">"""), $"amt".cast("string"), lit(" FCFA</span>")))
      .otherwise(concat(lit(" "), $"amt".cast("string"), lit(" FCFA ")))
    val contract = when($"m" === 6, lit(""))
      .otherwise(concat(lit("<p>type: "),
        element_at(typedLit(ContractMarkers), ($"m" + 1).cast("int")), lit("</p>")))
    val html = when($"b" === 0, concat(
        lit("""<div><h1 class="job-title">"""), title, lit("</h1>"),
        lit("""<div class="company-name">"""), company, lit("</div>"),
        lit("""<span class="location">Abidjan</span>"""), sal, lit("</div>")))
      .when($"b" === 1, concat(
        lit("<h1>"), title, lit("</h1> chez "), company, lit(","),
        lit("""<span class="location">Bouaké</span>"""), sal))
      .when($"b" === 2, concat(
        lit("""<div class="offer-title">"""), title, lit("</div>"),
        lit("<p>poste à Bouaké</p>"), sal))
      .when($"b" === 3, concat(
        lit("<h1>x</h1><title>"), title, lit("</title> chez "), company, lit(","),
        sal, lit("""<span class="location">Daloa</span>""")))
      .when($"b" === 4, concat(
        lit("""<h1 class="job-title">"""), title, lit("</h1>"),
        lit("""<div class="company-name">"""), company, lit("</div>"),
        sal, lit("<p>poste generique</p>")))
      .otherwise(concat(
        lit("""<h1 class="job-title">"""), title, lit("</h1>"),
        lit("""<div class="employer">"""), company, lit("</div>"),
        lit("""<span class="location">Korhogo</span>"""), sal))
    // description (every row: F3 selector path) and requirements
    // (b0/b5: F4; the reference appends every selector hit, so the
    // element lands twice — once via 'requirements', once via the
    // substring-matching 'requirement'). Wording is chosen to dodge
    // the whole-page substring scans: no contract markers, no city
    // names ('man'!), no chez/pour+[A-Z], no digits.
    val desc = lit("""<div class="description">""" + DescText + "</div>")
    val reqs = when($"b" === 0 || $"b" === 5,
      lit("""<ul class="requirements">""" + ReqText + "</ul>")).otherwise(lit(""))
    // one pageUdf call per row, then expand — seven per-field UDF calls
    // would decode the page string seven times (see HtmlExtract.pageUdf)
    base.withColumn("html", concat(html, desc, reqs, contract))
      .select($"id", HtmlExtract.pageUdf($"html").as("page"))
      .select($"id", $"page.*")
    // no ORDER BY: the driver compare row-sorts both sides, and a
    // global sort of 150k wide string rows only burns bench time
    // (CLAUDE.md oracle conventions)
  }

  private[queries] val DescText =
    "description du poste avec beaucoup de details sur les taches quotidiennes et le profil attendu"
  private[queries] val ReqText =
    "exigences techniques et qualites personnelles du candidat"

  private val q60Sql = {
    val companies = Companies.map(c => s"'$c'").mkString(", ")
    val contracts = Seq("CDI", "CDD", "Stage", "Freelance", "Alternance", "Mission")
      .map(c => s"'$c'").mkString(", ")
    s"""WITH base AS (
          SELECT o_orderkey AS id, trunc(o_totalprice)::BIGINT AS amt,
                 CAST(o_orderkey AS BIGINT) % 6 AS b, CAST(o_orderkey AS BIGINT) % 7 AS m,
                 CAST(o_orderkey AS BIGINT) % 4 AS cmod, CAST(o_orderkey AS BIGINT) % 2 AS par
          FROM orders)
        SELECT id,
          'Offre numero ' || id AS title,
          CASE WHEN b = 2 THEN 'Entreprise confidentielle'
               ELSE ([$companies])[cmod + 1] END AS company,
          '$DescText' AS description,
          CASE WHEN b = 0 OR b = 5 THEN '$ReqText' || ' ' || '$ReqText'
               ELSE NULL END AS requirements,
          CASE WHEN b = 0 THEN 'Abidjan'
               WHEN b = 1 THEN 'Bouaké'
               WHEN b = 2 THEN 'Bouaké'
               WHEN b = 3 THEN 'Daloa'
               WHEN b = 4 THEN 'Côte d''Ivoire'
               ELSE 'Korhogo' END AS location,
          CASE WHEN par = 0 THEN amt || ' FCFA' ELSE amt::VARCHAR END AS salary_text,
          CASE WHEN m = 6 THEN 'Non spécifié' ELSE ([$contracts])[m + 1] END
            AS contract_type
        FROM base"""
  }

  // ---------------------------------------------------------------- q61

  /** NLP skill-extraction kernels (F15 deterministic subset / F16
    * category / F17 confidence) over the documents corpus: extract ->
    * explode -> classify + score per detected skill. explode_outer +
    * null filter (the InferFiltersFromGenerate guard — see SCALE.md). */
  /** Deterministic skill-rich suffixes so several catalog categories
    * genuinely fire (the synthetic corpus vocabulary alone only
    * reaches two). Shared between the Spark side and the oracle. */
  private[queries] val SkillSuffixes = Seq(
    " stack python docker kubernetes",
    " stack react html css webpack",
    " stack tensorflow machine learning",
    " stack postgresql mongodb jenkins",
    "")

  private def q61(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.textkit.Skills
    val enriched = concat($"text",
      element_at(typedLit(SkillSuffixes), ($"doc_id" % 5 + 1).cast("int")))
    // ctx/marker staged BELOW the explode: confidence needs the
    // lowered document and the marker scan, and computing them above
    // the Generate would redo both per exploded skill row instead of
    // once per document (CollapseProject never duplicates non-cheap
    // exprs, so the staging projection survives)
    graft.Engine.spread(table(s, dir, "documents"))
      .select($"doc_id", enriched.as("t2"))
      .select($"doc_id", lower($"t2").as("ctx"),
        Skills.extractSkillsNlp($"t2").as("skills"))
      .withColumn("marker", Skills.hasSkillMarker($"ctx"))
      .select($"doc_id", $"ctx", $"marker", explode_outer($"skills").as("skill"))
      .where($"skill".isNotNull)
      .select($"doc_id", $"skill",
        Skills.classifySkillCategory($"skill").as("category"),
        roundSafe(Skills.skillConfidencePrepped($"skill", $"ctx", $"marker"), 4)
          .as("confidence"))
      .orderBy($"doc_id", $"skill")
  }

  /** Oracle generated from the SAME catalogs ([[Skills.nlpCatalog]],
    * [[Skills.nlpPatterns]], [[Skills.categoryCatalog]]) so the two
    * sides cannot drift. Pattern captures are single lowercase tokens
    * post-cleaning, so Title-casing replays as upper-first-char; the
    * test text is ASCII so RE2's \\w matches Java's (?U)\\w. */
  private val q61Sql = {
    import graft.textkit.Skills
    val catalogHits = Skills.nlpCatalog.map { case (cat, variants) =>
      val name = sqlLit(Skills.pythonTitle(cat.replace('_', ' ')))
      val cond = variants.map(v => s"contains(clean, ${sqlLit(v)})").mkString(" OR ")
      s"CASE WHEN $cond THEN $name END"
    }
    val patternHits = Skills.nlpPatterns.map { p =>
      val ext = s"nullif(regexp_extract(clean, ${sqlLit(p)}, 1), '')"
      s"""CASE WHEN $ext IS NOT NULL
            THEN upper(substring(replace($ext, '.', ''), 1, 1))
                 || substring(replace($ext, '.', ''), 2) END"""
    }
    val hits = (catalogHits ++ patternHits).mkString(",\n            ")
    val catCase = "CASE " + Skills.categoryCatalog.map { case (cat, keys) =>
      val cond = keys.map(k => s"contains(lower(skill), ${sqlLit(k)})").mkString(" OR ")
      s"WHEN $cond THEN ${sqlLit(cat)}"
    }.mkString(" ") + " ELSE 'Technique' END"
    val markers = Seq("compétences", "skills", "technologies", "outils")
      .map(w => s"contains(lower(text), ${sqlLit(w)})").mkString(" OR ")
    val suffixes = SkillSuffixes.map(sqlLit).mkString("[", ", ", "]")
    s"""WITH e AS (
          SELECT doc_id,
            text || ($suffixes)[(CAST(doc_id AS BIGINT) % 5) + 1] AS text
          FROM documents),
        c AS (
          SELECT doc_id, text,
            regexp_replace(regexp_replace(lower(coalesce(text, '')),
              '[^\\w\\s]', ' ', 'g'), '\\s+', ' ', 'g') AS clean
          FROM e),
        s AS (
          SELECT doc_id, text, unnest(
            CASE WHEN text IS NULL OR length(trim(text)) < 10 THEN []
                 ELSE list_distinct(list_filter([
            $hits], x -> x IS NOT NULL)) END) AS skill
          FROM c),
        f AS (
          SELECT doc_id, skill, text,
            (length(lower(text)) - length(replace(lower(text), lower(skill), '')))
              // length(lower(skill)) AS freq
          FROM s)
        SELECT doc_id, skill, $catCase AS category,
          round((least(0.9::DOUBLE, 0.6::DOUBLE + freq * 0.1::DOUBLE)
                 + CASE WHEN $markers THEN 0.1::DOUBLE ELSE 0.0::DOUBLE END) + 1e-9, 4)
            AS confidence
        FROM f ORDER BY doc_id, skill"""
  }

  val all: Seq[Q] = Seq(
    Q("q51_salary_kernel", q51 _, Some(q51Sql)),
    Q("q52_sector_kernel", q52 _, Some(q52Sql)),
    Q("q60_html_extract", q60 _, Some(q60Sql)),
    Q("q61_nlp_skills", q61 _, Some(q61Sql)))
}
