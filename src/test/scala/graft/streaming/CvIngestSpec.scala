package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** The reconstructed consume_cvs leg: envelope parse, document-seam
  * text extraction, kernel-based structure extraction, partitioned
  * landing, checkpoint recovery, and the end-to-end feed into the
  * matching join. */
class CvIngestSpec extends AnyFunSuite {
  import spark.implicits._

  private val clock = Some(java.sql.Timestamp.valueOf("2025-12-04 03:00:00"))

  private val cvText = "Développeur Python et Spark, 5 ans d'expérience, Master. " +
    "Localisation: Abidjan. Salaire souhaité: 400 000 FCFA. CDI souhaité, " +
    "télétravail possible, disponible immédiatement. Anglais courant. AWS Certified."

  private def msg(id: String, text: String, site: String = "cvtheque_ci",
      at: String = "2025-12-04T02:13:45") =
    s"""{"cv_id":"$id","scraped_at":"$at","source_site":"$site",
       |"url_cv":"https://example.ci/cv/$id","content_type":"pdf",
       |"content_b64":null,"text_content":"$text",
       |"undeclared_field":"dropped"}""".stripMargin.replace("\n", "")

  test("structure extraction runs the real kernels over the CV text") {
    val parsed = CvIngest.parseJsonValue(Seq(msg("cv1", cvText)).toDF("value"))
    assert(!parsed.columns.contains("undeclared_field")) // fixed-schema drop
    val row = CvIngest.structure(parsed, clock).first()
    assert(row.getAs[Long]("annees_experience") == 5L)
    assert(row.getAs[String]("niveau_etudes") == "Master")
    assert(row.getAs[String]("localisation_souhaitee_id") == "LOC_ABIDJAN")
    assert(row.getAs[Double]("salaire_souhaite") == 400000.0)
    assert(row.getAs[String]("type_contrat_souhaite") == "CDI")
    assert(row.getAs[Boolean]("teletravail_souhaite"))
    val skills = row.getSeq[String](row.fieldIndex("competences"))
    assert(skills.contains("Python") && skills.contains("Spark"))
    val compIds = row.getSeq[String](row.fieldIndex("competences_ids"))
    assert(compIds.contains("COMP_python"))
    assert(row.getSeq[String](row.fieldIndex("certifications")) == Seq("Aws Certified"))
    assert(row.getAs[String]("disponibilite") == "Immédiate")
    // the sector classifier sees python/spark/développeur -> tech
    assert(row.getAs[String]("secteur_souhaite_id") == "SECT_TECH")
    assert(row.getAs[java.sql.Date]("scraped_date").toString == "2025-12-04")
  }

  test("document seam: base64 bytes decode when no extractor text is present") {
    val b64 = java.util.Base64.getEncoder.encodeToString(
      "Comptable, 3 ans, banque et audit. Localisation: Bouaké."
        .getBytes("UTF-8"))
    val m = s"""{"cv_id":"cv2","scraped_at":"2025-12-04T01:00:00",
               |"source_site":"s","url_cv":"u","content_type":"docx",
               |"content_b64":"$b64","text_content":null}"""
      .stripMargin.replace("\n", "")
    val row = CvIngest.structure(CvIngest.parseJsonValue(Seq(m).toDF("value")), clock).first()
    assert(row.getAs[Long]("annees_experience") == 3L)
    // accented city misses the unaccented map key (reference quirk:
    // load_to_bigquery.py's city map has 'BOUAKE') -> LOC_ fallback
    assert(row.getAs[String]("localisation_souhaitee_id") == "LOC_BOUAKÉ")
    assert(row.getAs[String]("secteur_souhaite_id") == "SECT_FINANCE")
    // sparse text -> imputed defaults, not nulls
    assert(row.getAs[String]("type_contrat_souhaite") == "Non spécifié")
    assert(row.getAs[String]("statut") == "actif")
  }

  test("landing is partitioned by (scraped_date, source_site) and recovers from checkpoint") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cv-stream").toString
    Seq(msg("cv1", cvText), msg("cv2", "analyste 2 ans", site = "linkedin_ci"))
      .toDF("value").coalesce(1).write.mode("overwrite").text(s"$tmp/in")
    CvIngest.ingestFiles(spark, s"$tmp/in", s"$tmp/out", s"$tmp/chk", clock)

    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() == 2)
    val dateDirs = new java.io.File(s"$tmp/out").listFiles()
      .map(_.getName).filter(_.startsWith("scraped_date="))
    assert(dateDirs.contains("scraped_date=2025-12-04"))
    val siteDirs = new java.io.File(s"$tmp/out/scraped_date=2025-12-04")
      .listFiles().map(_.getName).toSet
    assert(siteDirs == Set("source_site=cvtheque_ci", "source_site=linkedin_ci"))

    // recovery: a new file arrives; restarting from the same checkpoint
    // processes ONLY the new file — no re-landing of cv1/cv2
    Seq(msg("cv3", "chauffeur 10 ans")).toDF("value").coalesce(1)
      .write.mode("append").text(s"$tmp/in")
    CvIngest.ingestFiles(spark, s"$tmp/in", s"$tmp/out", s"$tmp/chk", clock)
    val after = spark.read.parquet(s"$tmp/out")
    assert(after.count() == 3)
    assert(after.select("cv_id").distinct().count() == 3)
  }

  test("ingested CVs feed the matching join end-to-end") {
    val parsed = CvIngest.parseJsonValue(Seq(msg("cv1", cvText)).toDF("value"))
    val cvs = CvIngest.structure(parsed, clock)
      .select($"cv_id", $"localisation_souhaitee_id", $"secteur_souhaite_id",
        $"competences_ids", $"salaire_souhaite", $"annees_experience")
    val offers = Seq(
      ("JOB_TECH", "LOC_ABIDJAN", "SECT_TECH",
        Seq("COMP_python", "COMP_spark"), 500000L, "Senior"))
      .toDF("offre_id", "localisation_id", "secteur_id", "competences_ids",
        "salaire_max", "niveau_experience")
    val scores = graft.matching.Matching.score(offers, cvs, clock).collect()
    assert(scores.length == 1)
    val r = scores.head
    assert(r.getAs[String]("candidate_id") == "cv1")
    // skills 2/|cv skills| * 0.4 + loc 1.0*0.2 + salary 1.0*0.2 + exp(Senior, 5y)=1.0*0.2
    assert(r.getAs[Double]("location_match_pct") == 1.0)
    assert(r.getAs[Double]("salary_match_pct") == 1.0)
    assert(r.getAs[Double]("match_score") > 0.6)
  }
}
