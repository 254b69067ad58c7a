package graft.textkit

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic warehouse ID generators + experience inference, as
  * native Column expressions (the reference registers these as SQL
  * Python UDFs — load_to_bigquery.py:40-120,143-147).
  */
object Ids {

  /** ENT_ id (load_to_bigquery.py:40-46): upper, strip " .-", first 10. */
  def entrepriseId(company: Column): Column =
    when(company.isNull || length(company) === 0 ||
         company === "Entreprise confidentielle", lit("ENT_CONFIDENTIELLE"))
      .otherwise(concat(lit("ENT_"),
        substring(regexp_replace(upper(company), "[ .\\-]", ""), 1, 10)))

  /** Ivorian city id mapping (load_to_bigquery.py:55-67). */
  val cityMapping: Seq[(String, String)] = Seq(
    "ABIDJAN" -> "LOC_ABIDJAN", "BOUAKE" -> "LOC_BOUAKE",
    "DABOU" -> "LOC_DABOU", "DALOA" -> "LOC_DALOA",
    "YAMOUSSOUKRO" -> "LOC_YAMOUSSOUKRO", "SAN-PEDRO" -> "LOC_SAN_PEDRO",
    "KORHOGO" -> "LOC_KORHOGO", "MAN" -> "LOC_MAN",
    "GAGNOA" -> "LOC_GAGNOA", "DIVO" -> "LOC_DIVO", "SOUBRE" -> "LOC_SOUBRE")

  /** LOC_ id (load_to_bigquery.py:49-70): city map on upper+trim, else
    * LOC_ + first 15 chars with spaces underscored (truncate THEN
    * replace, matching the reference's slice-then-replace order). */
  def localisationId(location: Column): Column = {
    val clean = trim(upper(location))
    val fallback = concat(lit("LOC_"),
      regexp_replace(substring(clean, 1, 15), " ", "_"))
    val mapped = cityMapping.foldLeft(fallback) { case (acc, (city, id)) =>
      when(clean === city, lit(id)).otherwise(acc)
    }
    when(location.isNull || length(location) === 0, lit("LOC_COTE_DIVOIRE"))
      .otherwise(mapped)
  }

  /** COMP_ id (load_to_bigquery.py:73-78): lower, " "/"-" -> "_", first 20. */
  def competenceId(skill: Column): Column =
    when(skill.isNull || length(skill) === 0, lit(null).cast("string"))
      .otherwise(concat(lit("COMP_"),
        substring(regexp_replace(lower(skill), "[ \\-]", "_"), 1, 20)))

  /** First-match salary amount (load_to_bigquery.py:81-105): four regex
    * families in priority order; separators stripped; null if no match. */
  def parseSalaryAmount(salaryText: Column): Column = {
    val pats = Seq(
      "(\\d+(?:[\\s\\.,]\\d+)*)\\s*(?:FCFA|CFA|XOF)",
      "(\\d+(?:[\\s\\.,]\\d+)*)\\s*(?:€|\\$)",
      "(?i)salaire\\s*:?\\s*(\\d+(?:[\\s\\.,]\\d+)*)",
      "(?i)(\\d+(?:[\\s\\.,]\\d+)*)\\s*(?:par|/)\\s*(?:mois|month)")
    // regexp_extract yields "" on no-match; nullif folds to the next family
    val firstHit = coalesce(pats.map(p =>
      nullif(regexp_extract(coalesce(salaryText, lit("")), "(?i)" + p, 1), lit(""))): _*)
    val digits = regexp_replace(firstHit, "[\\s\\.,]", "")
    // guard the cast (ANSI mode): the regex guarantees digits-only, so
    // only absurd lengths could overflow int64
    when(length(digits).between(1, 18), digits.cast("long"))
      .otherwise(lit(null).cast("long"))
  }

  private def containsAny(text: Column, words: Seq[String]): Column =
    words.map(w => text.contains(w)).reduce(_ || _)

  /** Experience-level inference (load_to_bigquery.py:108-120). */
  def inferExperienceLevel(title: Column, description: Column): Column = {
    val text = lower(concat_ws(" ", coalesce(title, lit("")), coalesce(description, lit(""))))
    when(containsAny(text, Seq("junior", "debutant", "stagiaire", "entry", "0-2", "0-3")),
      "Débutant")
      .when(containsAny(text, Seq("senior", "expert", "lead", "principal", "chef", "5+", "10+")),
        "Senior")
      .when(containsAny(text, Seq("intermediaire", "confirme", "3-5", "mid-level")),
        "Intermédiaire")
      .otherwise("Non spécifié")
  }
}
