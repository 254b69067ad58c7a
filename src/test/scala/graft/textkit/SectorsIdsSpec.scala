package graft.textkit

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** Goldens from extract_sectors.py:48-345 and load_to_bigquery.py:40-120. */
class SectorsIdsSpec extends AnyFunSuite {
  import spark.implicits._

  test("sector classification matches reference goldens") {
    val cases = Seq(
      ("Développeur Python Senior", "NSIA Banque", "Développement d'applications web", "Abidjan", "SECT_TECH"),
      ("Comptable", "Cabinet XYZ", "Tenue de la comptabilité et audit", "Abidjan", "SECT_FINANCE"),
      ("Infirmier", "Clinique Sainte Marie", "Soins aux patients", "Bouaké", "SECT_SANTE"),
      ("Professeur de mathématiques", "Lycée Moderne", "Enseignement secondaire", "Daloa", "SECT_EDUCATION"),
      ("Chauffeur livreur", "Société de transport", "Livraison de colis", "Abidjan", "SECT_TRANSPORT"))
    cases.foreach { case (t, c, d, l, expected) =>
      val got = Sectors.classify(t, c, d, l)
      assert(got.secteur_id == expected, s"for $t")
      assert(got.confidence == 1.0f, s"for $t")
    }
    assert(Sectors.classify("Inconnu", "X", "Y", null) == Sectors.unknown)
    assert(Sectors.classify(null, null, null, null) == Sectors.unknown)
  }

  test("entreprise id generation") {
    val got = Seq("NSIA Banque", "Entreprise confidentielle", null, "Tech-Co. Ltd", "ab")
      .toDF("c").select(Ids.entrepriseId($"c")).as[String].collect()
    assert(got.toSeq == Seq("ENT_NSIABANQUE", "ENT_CONFIDENTIELLE",
      "ENT_CONFIDENTIELLE", "ENT_TECHCOLTD", "ENT_AB"))
  }

  test("localisation id generation") {
    val got = Seq("Abidjan", "abidjan ", "MAN", "Man ", "Grand-Bassam Centre Ville", null)
      .toDF("l").select(Ids.localisationId($"l")).as[String].collect()
    assert(got.toSeq == Seq("LOC_ABIDJAN", "LOC_ABIDJAN", "LOC_MAN", "LOC_MAN",
      "LOC_GRAND-BASSAM_CE", "LOC_COTE_DIVOIRE"))
  }

  test("competence id generation") {
    val got = Seq("Power BI", "C++", null, "a very long skill name indeed")
      .toDF("s").select(Ids.competenceId($"s")).as[String].collect()
    assert(got.toSeq == Seq("COMP_power_bi", "COMP_c++", null, "COMP_a_very_long_skill_na"))
  }

  test("salary amount parsing") {
    val got = Seq("800 000 FCFA", "1.200 €", "salaire: 500000", "250000 par mois", "rien")
      .toDF("t").select(Ids.parseSalaryAmount($"t")).as[Option[Long]].collect()
    assert(got.toSeq == Seq(Some(800000L), Some(1200L), Some(500000L), Some(250000L), None))
  }

  test("experience level inference") {
    val got = Seq(("Développeur Senior", ""), ("Stagiaire junior", null),
      ("Analyste confirme 3-5 ans", ""), ("Poste", ""))
      .toDF("t", "d").select(Ids.inferExperienceLevel($"t", $"d")).as[String].collect()
    assert(got.toSeq == Seq("Senior", "Débutant", "Intermédiaire", "Non spécifié"))
  }

  test("contract type extraction") {
    assert(HtmlExtract.extractContractType("<p>Poste en CDI à pourvoir</p>") == "CDI")
    assert(HtmlExtract.extractContractType("stage de formation") == "Stage")
    assert(HtmlExtract.extractContractType("mission projet") == "Mission")
    assert(HtmlExtract.extractContractType("<div>rien</div>") == "Non spécifié")
  }
}
