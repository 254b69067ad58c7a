package graft.textkit

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** Golden values below were produced by executing the reference's pure
  * Python functions (deduplicate.py:45-139) directly. */
class NormalizeSpec extends AnyFunSuite {
  import spark.implicits._

  private def norm1(s: String): String =
    Seq(s).toDF("t").select(Normalize.normText($"t")).as[String].first()

  test("normalize matches reference goldens") {
    assert(norm1("Développeur Python Senior (H/F)") == "développeur python senior")
    assert(norm1("  Chef de projet – BTP à Abidjan!  ") == "chef projet btp abidjan")
    assert(norm1("de la les et") == "")
    assert(norm1("C'est ça") == "")
  }

  private def sim(t1: String, c1: String, l1: String,
      t2: String, c2: String, l2: String): Double =
    Seq((t1, c1, l1, t2, c2, l2)).toDF("t1", "c1", "l1", "t2", "c2", "l2")
      .select(Normalize.similarityScore($"t1", $"c1", $"l1", $"t2", $"c2", $"l2"))
      .as[Double].first()

  test("similarity matches reference goldens") {
    assert(math.abs(sim("Développeur Python Senior", "NSIA Banque", "Abidjan",
      "Développeur Python", "NSIA Banque", "Abidjan") - 0.8333333333333333) < 1e-9)
    assert(sim("Développeur Python", "ACME", "Abidjan",
      "Ingénieur Données", "Other", "Bouaké") == 0.0)
    assert(sim("A B", "X", "Y", "A B", "X", "Y") == 0.5)
    assert(sim("", "X", "Y", "A B", "X", "Y") == 0.0)
  }

  private def key(t: String, c: String, l: String): String =
    Seq((t, c, l)).toDF("t", "c", "l")
      .select(Normalize.similarityKey($"t", $"c", $"l")).as[String].first()

  test("blocking key matches reference goldens") {
    assert(key("Développeur Python Senior Java", "NSIA Banque Group", "Abidjan") ==
      "développeur_python_senior_nsia_banque_abidjan")
    assert(key("", "", "") == "UNKNOWN")
    assert(key("de le la", "du", "des") == "UNKNOWN")
  }

  test("completeness matches reference goldens") {
    val df = Seq(
      ("Développeur Python", "NSIA", "Une description suffisamment longue ici",
        "Abidjan", Seq("Python"), "800000 FCFA"),
      ("Dev", "Entreprise confidentielle", "court", "Côte d'Ivoire", Seq[String](), null),
      ("Titre valide6", "ACME", "x" * 21, "Côte d'Ivoire", null, ""))
      .toDF("t", "c", "d", "l", "sk", "sal")
    val got = df.select(
      Normalize.completenessScore($"t", $"c", $"d", $"l", $"sk", $"sal")).as[Double].collect()
    assert(got.toSeq == Seq(1.0, 0.0, 0.5))
  }

  private def randomText(rnd: scala.util.Random): String =
    Seq.fill(2 + rnd.nextInt(5))("w" + rnd.alphanumeric.filter(_.isLetter)
      .take(3 + rnd.nextInt(5)).mkString.toLowerCase).mkString(" ")

  test("property: similarity is symmetric and bounded (40 seeded cases, batched)") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(40) {
      (randomText(rnd), randomText(rnd), randomText(rnd), randomText(rnd))
    }
    val df = cases.toDF("t1", "t2", "c", "l")
    val scored = df.select(
      Normalize.similarityScore($"t1", $"c", $"l", $"t2", $"c", $"l").as("ab"),
      Normalize.similarityScore($"t2", $"c", $"l", $"t1", $"c", $"l").as("ba"))
      .as[(Double, Double)].collect()
    scored.foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9)
      assert(a >= 0.0 && a <= 1.0)
    }
  }

  test("property: identical offers with surviving tokens score 1.0") {
    val rnd = new scala.util.Random(7)
    val titles = Seq.fill(20)(randomText(rnd))
    val scored = titles.toDF("t").select(
      Normalize.similarityScore($"t", lit("acme corp"), lit("abidjan"),
        $"t", lit("acme corp"), lit("abidjan"))).as[Double].collect()
    scored.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }
}
