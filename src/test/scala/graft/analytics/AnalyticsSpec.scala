package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class AnalyticsSpec extends AnyFunSuite {
  import spark.implicits._

  private def enriched = Seq(
    ("J1", java.sql.Timestamp.valueOf("2025-12-01 08:00:00"), Seq("Python", "Sql"),
      "SECT_TECH", "Senior", Some(500000), Some(900000), Some(700000.0f), "CDI"),
    ("J2", java.sql.Timestamp.valueOf("2025-12-01 09:00:00"), Seq("Python"),
      "SECT_TECH", "Débutant", Some(150000), Some(300000), Some(225000.0f), "CDD"),
    ("J3", java.sql.Timestamp.valueOf("2025-12-02 10:00:00"), Seq("Excel"),
      "SECT_FINANCE", "Senior", None, None, None, "CDI"))
    .toDF("job_id", "parsed_at", "skills", "secteur_id", "niveau_experience",
      "salary_min_fcfa", "salary_max_fcfa", "salary_avg_fcfa", "contract_type")

  test("offers per day") {
    val got = Analytics.offersPerDay(enriched).collect()
    assert(got.map(r => (r.getDate(0).toString, r.getLong(1))).toSeq ==
      Seq(("2025-12-01", 2L), ("2025-12-02", 1L)))
  }

  test("top skills") {
    val got = Analytics.topSkills(enriched, 2).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("Python", 2L), ("Excel", 1L)))
  }

  test("salary by sector/experience skips null salaries") {
    val got = Analytics.salaryBySectorExperience(enriched)
    assert(got.count() == 2) // J3 has no salary
  }

  test("contract mix and skills by sector") {
    assert(Analytics.contractMix(enriched).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("CDI", 2L), ("CDD", 1L)))
    val bySector = Analytics.skillsBySector(enriched, 1).collect()
    assert(bySector.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("SECT_TECH", "Python"), ("SECT_FINANCE", "Excel")))
  }
}
