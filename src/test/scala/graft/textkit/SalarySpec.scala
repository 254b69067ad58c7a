package graft.textkit

import org.scalatest.funsuite.AnyFunSuite

/** Goldens produced by executing the reference's Python functions
  * (extract_salary.py:43-250) directly — including the documented
  * currency/period substring quirks. */
class SalarySpec extends AnyFunSuite {

  import Salary._

  test("plain FCFA amount") {
    val r = parseComprehensive("800 000 FCFA/MOIS", null, null)
    assert(r == Parsed(Some(800000), Some(800000), "FCFA", "monthly", 0.8f, "parsed"))
  }

  test("'développeur' in context forces EUR conversion (reference quirk)") {
    val r = parseComprehensive("800 000 FCFA/MOIS",
      "Nous recherchons un développeur Python", "Développeur Python Senior")
    assert(r == Parsed(Some(524000000), Some(524000000), "EUR", "monthly", 0.8f, "parsed"))
  }

  test("range entre X et Y") {
    val r = parseComprehensive("entre 500 000 et 900 000 FCFA", "poste stable", "Comptable")
    assert(r == Parsed(Some(500000), Some(900000), "FCFA", "monthly", 0.9f, "parsed"))
  }

  test("euro amount converts x655") {
    val r = parseComprehensive("1200 €", "remote ok", "Data Engineer")
    assert(r == Parsed(Some(786000), Some(786000), "EUR", "monthly", 0.8f, "parsed"))
  }

  test("usd amount converts x600") {
    val r = parseComprehensive("2000 $ par mois", "usd salary", "DevOps")
    assert(r == Parsed(Some(1200000), Some(1200000), "USD", "monthly", 0.8f, "parsed"))
  }

  test("'vendeur' triggers EUR + négociable multiplier (reference quirk)") {
    val r = parseComprehensive("salaire: 350.000 FCFA négociable", null, "Vendeur")
    assert(r.salary_min.contains(229250000) && r.currency == "EUR")
    assert(math.abs(r.confidence - 0.64f) < 1e-6)
  }

  test("'analyste' contains 'an' so period becomes yearly /12 (reference quirk)") {
    val r = parseComprehensive(null, "salaire de 450 000 fcfa selon expérience", "Analyste")
    assert(r.salary_min.contains(37500) && r.period == "yearly")
    assert(math.abs(r.confidence - 0.72f) < 1e-6)
  }

  test("no salary -> none struct") {
    val r = parseComprehensive(null, "rien ici", "Juste un titre")
    assert(r == Parsed(None, None, "FCFA", "monthly", 0.0f, "none"))
  }

  test("minimum multiplier") {
    val r = parseComprehensive("300000 FCFA minimum", null, "Agent")
    assert(r.salary_min.contains(300000))
    assert(math.abs(r.confidence - 0.56f) < 1e-6)
  }

  test("inference grid with Abidjan and CDD adjustments") {
    assert(inferRange("Développeur Python Senior", "Abidjan", "CDI") ==
      Parsed(Some(600000), Some(1800000), "FCFA", "monthly", 0.3f, "inferred"))
    assert(inferRange("junior analyste", "Bouaké", "CDD") ==
      Parsed(Some(135000), Some(360000), "FCFA", "monthly", 0.3f, "inferred"))
    assert(inferRange("manager des ventes", "Abidjan", "CDD") ==
      Parsed(Some(1080000), Some(3240000), "FCFA", "monthly", 0.3f, "inferred"))
    assert(inferRange("inconnu", "X", "CDI").source == "none")
    assert(inferRange("architecte cloud", null, null) ==
      Parsed(Some(600000), Some(1800000), "FCFA", "monthly", 0.3f, "inferred"))
  }

  test("normalized struct backfills min/max and averages") {
    import graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Some(100), Some(200), "FCFA", "monthly", 0.8f, "parsed"),
      (Some(100), None, "FCFA", "monthly", 0.8f, "parsed"),
      (None: Option[Int], None: Option[Int], "FCFA", "monthly", 0.0f, "none"))
      .toDF("salary_min", "salary_max", "currency", "period", "confidence", "source")
      .select(struct($"salary_min", $"salary_max", $"currency", $"period",
        $"confidence", $"source").as("p"))
    val out = df.select(Salary.normalized($"p").as("n"))
      .select("n.salary_min_fcfa", "n.salary_max_fcfa", "n.salary_avg_fcfa", "n.data_source")
      .collect()
    assert(out(0).getInt(0) == 100 && out(0).getInt(1) == 200 && out(0).getFloat(2) == 150.0f)
    assert(out(1).getInt(0) == 100 && out(1).getInt(1) == 100 && out(1).getFloat(2) == 100.0f)
    assert(out(2).isNullAt(0) && out(2).isNullAt(2) && out(2).getString(3) == "none")
  }

  test("normalized treats 0 amounts as missing (Python truthiness, reference-probed)") {
    import graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Some(0), Some(0), "FCFA", "monthly", 0.8f, "parsed"),
      (Some(0), Some(500), "FCFA", "monthly", 0.8f, "parsed"),
      (Some(300), Some(0), "FCFA", "monthly", 0.8f, "parsed"))
      .toDF("salary_min", "salary_max", "currency", "period", "confidence", "source")
      .select(struct($"salary_min", $"salary_max", $"currency", $"period",
        $"confidence", $"source").as("p"))
    val out = df.select(Salary.normalized($"p").as("n"))
      .select("n.salary_min_fcfa", "n.salary_max_fcfa", "n.salary_avg_fcfa").collect()
    // (0,0) -> kept as 0/0, avg NULL; (0,500) -> backfilled to 500/500/500
    assert(out(0).getInt(0) == 0 && out(0).getInt(1) == 0 && out(0).isNullAt(2))
    assert(out(1).getInt(0) == 500 && out(1).getInt(1) == 500 && out(1).getFloat(2) == 500.0f)
    assert(out(2).getInt(0) == 300 && out(2).getInt(1) == 300 && out(2).getFloat(2) == 300.0f)
  }

  test("normalized averages huge int32 amounts without ANSI overflow") {
    import graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val big = Int.MaxValue - 1
    val df = Seq((Some(big), Some(big), "FCFA", "monthly", 0.8f, "parsed"))
      .toDF("salary_min", "salary_max", "currency", "period", "confidence", "source")
      .select(struct($"salary_min", $"salary_max", $"currency", $"period",
        $"confidence", $"source").as("p"))
    val avg = df.select(Salary.normalized($"p").getField("salary_avg_fcfa")).first().getFloat(0)
    assert(math.abs(avg - big.toFloat) < 1e3)
  }
}
