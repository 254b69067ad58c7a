package graft.textkit

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-normalization + similarity kernels of the reference's dedup
  * stage, as pure Column expressions (whole-stage codegen; the
  * reference used Python UDFs — deduplicate.py:45-139).
  *
  * Semantics preserved exactly:
  *  - normalize (deduplicate.py:45-70): lowercase; non-word chars
  *    (unicode \w, hence the (?U) flag — Python re is unicode-aware) to
  *    spaces; drop 35 French stopwords and words of length <= 2.
  *  - similarity (deduplicate.py:73-109): 0.5 * Jaccard(title token
  *    sets) + 0.3 * [company equal normalized] + 0.2 * [location equal
  *    normalized]; 0.0 when any input is null/empty.
  *  - blocking key (deduplicate.py:112-124): first 3 title + 2 company
  *    + 1 location normalized tokens, '_'-joined, else 'UNKNOWN'.
  *  - completeness (deduplicate.py:127-139): fraction of 6 fields
  *    non-trivially filled.
  */
object Normalize {

  /** French stopword set (deduplicate.py:60-65). */
  val stopwords: Seq[String] = Seq(
    "de", "du", "des", "le", "la", "les", "et", "à", "un", "une", "dans",
    "pour", "par", "sur", "avec", "sans", "sous", "chez", "comme", "qui",
    "que", "dont", "où", "quand", "comment", "pourquoi", "si", "alors",
    "mais", "car", "donc", "or", "ni", "soit", "c", "est", "ce", "ci", "ça")

  private val stopLit = typedLit(stopwords)

  /** Normalized token array of a free-text column (null-safe: null -> []). */
  def normTokens(c: Column): Column = {
    val cleaned = regexp_replace(lower(coalesce(c, lit(""))), "(?U)[^\\w\\s]", " ")
    filter(split(cleaned, "\\s+"),
      w => length(w) > 2 && !array_contains(stopLit, w))
  }

  /** Normalized text: tokens re-joined with single spaces (F9 output). */
  def normText(c: Column): Column = array_join(normTokens(c), " ")

  /** Jaccard over two token-SET columns; 0.0 when either set is empty. */
  private def tokenJaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(size(a) === 0 || size(b) === 0, 0.0).otherwise(inter / union)
  }

  private def emptyish(c: Column): Column = c.isNull || length(c) === 0

  /** Weighted similarity of two offers (title/company/location columns).
    * Mirrors deduplicate.py:73-109 including the all-fields-present
    * guard. */
  def similarityScore(t1: Column, c1: Column, l1: Column,
      t2: Column, c2: Column, l2: Column): Column = {
    val titleScore = tokenJaccard(array_distinct(normTokens(t1)), array_distinct(normTokens(t2)))
    val companyScore = when(normText(c1) === normText(c2), 1.0).otherwise(0.0)
    val locationScore = when(normText(l1) === normText(l2), 1.0).otherwise(0.0)
    when(emptyish(t1) || emptyish(c1) || emptyish(l1) ||
         emptyish(t2) || emptyish(c2) || emptyish(l2), 0.0)
      .otherwise(titleScore * 0.5 + companyScore * 0.3 + locationScore * 0.2)
  }

  /** Pair scoring over PRE-normalized columns — the join-friendly form:
    * normalize + hash once per row in the map stage, score cheap
    * primitive ops per pair. Semantically identical to
    * [[similarityScore]] (which normalizes inline and is fine for
    * single-row use); at scale the per-pair cost of re-running regex
    * tokenization dominates a blocked self-join, so the dedup engine
    * uses this form.
    *
    * `tToksX` = [[simTokensHashed]] output (sorted distinct int64);
    * `okX` = all three raw fields non-null and non-empty. */
  def similarityScorePrepped(
      tToksA: Column, cNormA: Column, lNormA: Column, okA: Column,
      tToksB: Column, cNormB: Column, lNormB: Column, okB: Column): Column = {
    val titleScore = graft.functions.ArrayOps.sortedJaccard(tToksA, tToksB)
    when(!okA || !okB, 0.0)
      .otherwise(titleScore * 0.5 +
        when(cNormA === cNormB, 1.0).otherwise(0.0) * 0.3 +
        when(lNormA === lNormB, 1.0).otherwise(0.0) * 0.2)
  }

  /** Distinct-token set for the prepped scorer. */
  def simTokens(c: Column): Column = array_distinct(normTokens(c))

  /** Sorted md5-hashed distinct token set — jaccard-equivalent to the
    * string set (60-bit hashes; collisions negligible), primitive-typed
    * for the merge-walk intersection. */
  def simTokensHashed(c: Column): Column =
    sort_array(transform(simTokens(c), t => graft.functions.TextFunctions.tokenHash(t)))

  /** Non-empty guard matching similarityScore's all-fields-present check. */
  def simOk(t: Column, c: Column, l: Column): Column =
    !(t.isNull || length(t) === 0 || c.isNull || length(c) === 0 ||
      l.isNull || length(l) === 0)

  /** Dedup blocking key (F11). */
  def similarityKey(title: Column, company: Column, location: Column): Column = {
    val parts = concat(
      slice(normTokens(title), 1, 3),
      slice(normTokens(company), 1, 2),
      slice(normTokens(location), 1, 1))
    when(size(parts) === 0, lit("UNKNOWN")).otherwise(array_join(parts, "_"))
  }

  /** Offer completeness score in [0,1] (F12): 6 field checks / 6. */
  def completenessScore(title: Column, company: Column, description: Column,
      location: Column, skills: Column, salaryText: Column): Column = {
    val checks = Seq(
      title.isNotNull && length(trim(title)) > 5,
      company.isNotNull && length(company) > 0 && company =!= "Entreprise confidentielle",
      description.isNotNull && length(trim(description)) > 20,
      location.isNotNull && length(location) > 0 && location =!= "Côte d'Ivoire",
      skills.isNotNull && size(skills) > 0,
      salaryText.isNotNull && length(trim(salaryText)) > 0)
    checks.map(c => when(c, 1.0).otherwise(0.0)).reduce(_ + _) / 6.0
  }

  /** Source priority of the keep-best rule (deduplicate.py:154-159). */
  def sourcePriority(source: Column): Column =
    when(lower(source) === "educarriere", 4)
      .when(lower(source) === "macarrierepro", 3)
      .when(lower(source) === "emploi_ci", 2)
      .when(lower(source) === "linkedin", 1)
      .otherwise(0)
}
