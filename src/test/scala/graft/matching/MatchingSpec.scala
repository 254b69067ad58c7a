package graft.matching

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** FIXTURES §4 oracle cases for the spec-derived matching score. */
class MatchingSpec extends AnyFunSuite {
  import spark.implicits._

  private def offers = Seq(
    // offre_id, loc, sect, competences_ids, salaire_max, niveau
    ("JOB_PERFECT", "LOC_ABIDJAN", "SECT_TECH",
      Seq("COMP_python", "COMP_sql", "COMP_docker"), 800000L, "Senior"),
    ("JOB_SKILLS_ONLY", "LOC_BOUAKE", "SECT_TECH",
      Seq("COMP_python", "COMP_sql", "COMP_docker"), 100000L, "Débutant"),
    ("JOB_NO_OVERLAP", "LOC_DALOA", "SECT_AGRO",
      Seq("COMP_cacao"), 100000L, "Débutant"))
    .toDF("offre_id", "localisation_id", "secteur_id", "competences_ids",
      "salaire_max", "niveau_experience")

  private def cvs = Seq(
    ("CV_1", "LOC_ABIDJAN", "SECT_TECH",
      Seq("COMP_python", "COMP_sql", "COMP_docker"), 700000.0, 6L))
    .toDF("cv_id", "localisation_souhaitee_id", "secteur_souhaite_id",
      "competences_ids", "salaire_souhaite", "annees_experience")

  test("perfect match scores 1.0; partial and zero-overlap ranked below") {
    val scores = Matching.score(offers, cvs,
      Some(java.sql.Timestamp.valueOf("2025-12-04 03:00:00")))
    val byJob = scores.collect().map(r =>
      r.getAs[String]("job_id") -> r.getAs[Double]("match_score")).toMap
    assert(byJob("JOB_PERFECT") == 1.0)
    // skills 1.0*0.4 + loc 0 + salary (100000/700000)*0.2 + exp(Débutant,6y:
    // dist 4 -> 0.2)*0.2
    assert(math.abs(byJob("JOB_SKILLS_ONLY") -
      (0.4 + 0.2 * 100000.0 / 700000.0 + 0.2 * 0.2)) < 1e-6)
    // JOB_NO_OVERLAP shares no block key with CV_1 -> not even a candidate
    assert(!byJob.contains("JOB_NO_OVERLAP"))
  }

  test("top-k per candidate ranks by score") {
    val scores = Matching.score(offers, cvs, None)
    val top = Matching.topKPerCandidate(scores, 1).collect()
    assert(top.length == 1 && top.head.getAs[String]("job_id") == "JOB_PERFECT")
  }

  test("component functions handle nulls") {
    val df = Seq((null: Seq[String], Seq("COMP_x"), null: java.lang.Long,
      null: java.lang.Double)).toDF("os", "cs", "omax", "want")
    val r = df.select(
      Matching.skillMatchPct($"os", $"cs"),
      Matching.salaryMatchPct($"omax", $"want")).first()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }
}
