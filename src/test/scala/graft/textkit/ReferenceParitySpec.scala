package graft.textkit

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** Bulk golden parity against the reference implementation: 3000
  * randomized cases executed through the reference's own Python
  * functions (scripts/gen_goldens.py, seed 42) and replayed here
  * through this engine's kernels. Regenerate with
  * `python3 scripts/gen_goldens.py` if the reference snapshot moves.
  */
class ReferenceParitySpec extends AnyFunSuite {
  import spark.implicits._

  private def load(name: String, schema: String): DataFrame =
    spark.read.schema(schema).json(s"src/test/resources/goldens/$name.jsonl")

  private def assertAll(df: DataFrame, okCol: String = "ok"): Unit = {
    val bad = df.where(!col(okCol)).limit(5).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
  }

  test("F9 normalize parity (300 cases)") {
    val df = load("normalize", "in STRING, out STRING")
    assertAll(df.select(
      (Normalize.normText($"in") === $"out").as("ok"), $"in", $"out"))
  }

  test("F11 similarity key parity (300 cases)") {
    val df = load("simkey", "t STRING, c STRING, l STRING, out STRING")
    assertAll(df.select(
      (Normalize.similarityKey($"t", $"c", $"l") === $"out").as("ok"), $"t", $"out"))
  }

  test("F10 similarity score parity (300 cases)") {
    val df = load("similarity",
      "t1 STRING, c1 STRING, l1 STRING, t2 STRING, c2 STRING, l2 STRING, out DOUBLE")
    assertAll(df.select(
      (abs(Normalize.similarityScore($"t1", $"c1", $"l1", $"t2", $"c2", $"l2")
        - $"out") < 1e-9).as("ok"), $"t1", $"out"))
  }

  test("F12 completeness parity (200 cases)") {
    val df = load("completeness",
      "title STRING, company STRING, desc STRING, loc STRING, skills ARRAY<STRING>, sal STRING, out DOUBLE")
    assertAll(df.select(
      (abs(Normalize.completenessScore($"title", $"company", $"desc", $"loc",
        $"skills", $"sal") - $"out") < 1e-12).as("ok"), $"title", $"out"))
  }

  test("F16 skill category parity (200 cases)") {
    val df = load("skillcat", "s STRING, out STRING")
    assertAll(df.select(
      (Skills.classifySkillCategory($"s") === $"out").as("ok"), $"s", $"out"))
  }

  test("F17 skill confidence parity (200 cases)") {
    val df = load("skillconf", "s STRING, c STRING, out DOUBLE")
    assertAll(df.select(
      (abs(Skills.skillConfidence($"s", $"c") - $"out") < 1e-6).as("ok"), $"s", $"out"))
  }

  test("F8 parse-skill catalog parity (200 cases)") {
    val df = load("parseskills", "t STRING, out ARRAY<STRING>")
    assertAll(df.select(
      (sort_array(Skills.extractSkills($"t")) <=> sort_array($"out")).as("ok"),
      $"t", $"out"))
  }

  test("F22-F26 id generator parity (200 cases)") {
    val df = load("ids",
      "company STRING, loc STRING, skill STRING, sal STRING, t STRING, d STRING, " +
        "ent STRING, locid STRING, comp STRING, amount BIGINT, exp STRING")
    assertAll(df.select(
      ((Ids.entrepriseId($"company") <=> $"ent") &&
        (Ids.localisationId($"loc") <=> $"locid") &&
        (Ids.competenceId($"skill") <=> $"comp") &&
        (Ids.parseSalaryAmount($"sal") <=> $"amount") &&
        (Ids.inferExperienceLevel($"t", $"d") <=> $"exp")).as("ok"),
      $"company", $"loc", $"skill", $"sal"))
  }

  // ---- plain-Scala kernels: iterate collected rows ----

  private def s(r: Row, f: String): String =
    if (r.isNullAt(r.fieldIndex(f))) null else r.getString(r.fieldIndex(f))

  test("F18 salary parse parity (400 cases)") {
    val rows = load("salary_parse",
      "s STRING, d STRING, t STRING, " +
        "out STRUCT<salary_min: INT, salary_max: INT, currency: STRING, " +
        "period: STRING, confidence: DOUBLE, source: STRING>").collect()
    rows.foreach { r =>
      val got = Salary.parseComprehensive(s(r, "s"), s(r, "d"), s(r, "t"))
      val exp = r.getStruct(r.fieldIndex("out"))
      def oi(i: Int) = if (exp.isNullAt(i)) None else Some(exp.getInt(i))
      assert(got.salary_min == oi(0) && got.salary_max == oi(1),
        s"amounts for $r -> $got")
      assert(got.currency == exp.getString(2) && got.period == exp.getString(3),
        s"currency/period for $r -> $got")
      assert(math.abs(got.confidence - exp.getDouble(4)) < 1e-6, s"conf for $r -> $got")
      assert(got.source == exp.getString(5), s"source for $r -> $got")
    }
  }

  test("F19 salary inference parity (200 cases)") {
    val rows = load("salary_infer",
      "t STRING, l STRING, c STRING, " +
        "out STRUCT<salary_min: INT, salary_max: INT, currency: STRING, " +
        "period: STRING, confidence: DOUBLE, source: STRING>").collect()
    rows.foreach { r =>
      val got = Salary.inferRange(s(r, "t"), s(r, "l"), s(r, "c"))
      val exp = r.getStruct(r.fieldIndex("out"))
      def oi(i: Int) = if (exp.isNullAt(i)) None else Some(exp.getInt(i))
      assert(got.salary_min == oi(0) && got.salary_max == oi(1) &&
        got.source == exp.getString(5), s"for $r -> $got")
    }
  }

  test("F21 sector classification parity (300 cases)") {
    val rows = load("sector",
      "t STRING, c STRING, d STRING, l STRING, " +
        "out STRUCT<secteur_id: STRING, secteur_nom: STRING, " +
        "categorie_parent: STRING, confidence: DOUBLE>").collect()
    rows.foreach { r =>
      val got = Sectors.classify(s(r, "t"), s(r, "c"), s(r, "d"), s(r, "l"))
      val exp = r.getStruct(r.fieldIndex("out"))
      assert(got.secteur_id == exp.getString(0) &&
        got.categorie_parent == exp.getString(2), s"for $r -> $got")
      assert(math.abs(got.confidence - exp.getDouble(3)) < 1e-6, s"conf for $r -> $got")
    }
  }

  test("F7 contract type parity (200 cases)") {
    val rows = load("contract", "t STRING, out STRING").collect()
    rows.foreach { r =>
      assert(HtmlExtract.extractContractType(s(r, "t")) ==
        s(r, "out"), s"for ${s(r, "t")}")
    }
  }
}
