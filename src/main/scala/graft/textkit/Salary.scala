package graft.textkit

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Salary parsing / inference / normalization — the reference's
  * extract_salary stage (extract_salary.py:43-291; F18-F20).
  *
  * F18 is deliberately a Scala UDF (the reference's regex cascade is too
  * branchy for readable Column expressions; SURVEY §2.9 marks it (U)) —
  * still JVM-side, no process boundary. F19/F20 follow the same split
  * as the reference: inference only when confidence == 0, then pure
  * Column normalization.
  *
  * Bug-compatible quirks preserved on purpose (they ARE the reference's
  * observable semantics, documented here so nobody "fixes" them without
  * deciding to diverge):
  *  - currency detection scans the WHOLE text for the substrings
  *    '€'/'eur'/'euros' — so French words containing "eur"
  *    ("développeur", "ingénieur") force EUR and a x655 conversion
  *    (extract_salary.py:124-128);
  *  - period detection scans for 'an'/'ans'/... substrings — "dans",
  *    "analyste" etc. force yearly and a /12 division
  *    (extract_salary.py:138-142);
  *  - thousand separators '.'/','/' ' are all stripped before int
  *    parsing, so decimals concatenate (extract_salary.py:108-117).
  */
object Salary {

  case class Parsed(
      salary_min: Option[Int], salary_max: Option[Int],
      currency: String, period: String,
      confidence: Float, source: String)

  private val none = Parsed(None, None, "FCFA", "monthly", 0.0f, "none")

  /** The nine pattern families (extract_salary.py:71-93), in order.
    * `groups` = number of capture groups (2 = range pattern). */
  private val patterns: Seq[(scala.util.matching.Regex, Int)] = Seq(
    ("""(\d+(?:[\s\.,]\d+)*)\s*(?:fcfa|cfa|xof|francs?|f\s*cf)""", 1),
    ("""(?:salaire|rémunération|paye|paie)\s*:?\s*(\d+(?:[\s\.,]\d+)*)\s*(?:fcfa|cfa|xof|francs?)""", 1),
    ("""(\d+(?:[\s\.,]\d+)*)\s*(?:€|eur|euros?|euros)""", 1),
    ("""(\d+(?:[\s\.,]\d+)*)\s*(?:\$|usd|dollars?)""", 1),
    ("""(\d+(?:[\s\.,]\d+)*)\s*(?:fcfa|cfa|xof|€|\$)\s*(?:par|/)\s*(?:mois|month|mensuel)""", 1),
    ("""(\d+(?:[\s\.,]\d+)*)\s*(?:fcfa|cfa|xof|€|\$)\s*(?:par|/)\s*(?:an|ans|year|annuel)""", 1),
    ("""(\d+(?:[\s\.,]\d+)*)\s*(?:à|a|-)\s*(\d+(?:[\s\.,]\d+)*)\s*(?:fcfa|cfa|xof|€|\$)""", 2),
    ("""entre\s*(\d+(?:[\s\.,]\d+)*)\s*et\s*(\d+(?:[\s\.,]\d+)*)\s*(?:fcfa|cfa|xof|€|\$)""", 2),
    ("""(\d+(?:[\s\.,]\d+)*)\s*(?:fcfa|cfa|xof|€|\$)\s*(?:négociable|à négocier|selon expérience)""", 1),
    ("""(\d+(?:[\s\.,]\d+)*)\s*(?:fcfa|cfa|xof)\s*(?:selon|en fonction de)\s*(?:expérience|profil|exp)""", 1))
    .map { case (p, g) => (("(?iu)" + p).r, g) } // compiled ONCE, not per row

  /** Python `int(float(x.replace(...)))`: the digit string goes through
    * DOUBLE first (so >2^53 inputs round exactly like CPython), then
    * truncates; arbitrary precision thereafter. */
  private def parseAmount(s: String): Option[BigInt] =
    try {
      val digits = s.replace(" ", "").replace(",", "").replace(".", "")
      Some(BigInt(new java.math.BigDecimal(digits.toDouble).toBigInteger))
    } catch { case _: NumberFormatException => None }

  /** PySpark's IntegerType struct cast: out-of-range values become NULL
    * per field — the production reference's observable behavior. */
  private def toIntField(v: BigInt): Option[Int] =
    if (v >= Int.MinValue && v <= Int.MaxValue) Some(v.toInt) else None

  /** F18 core, one row. */
  def parseComprehensive(salaryText: String, description: String, title: String): Parsed = {
    val parts = Seq(salaryText, description, title).filter(s => s != null && s.nonEmpty)
    if (parts.isEmpty) return none
    val fullText = parts.mkString(" ")
    val lo = fullText.toLowerCase

    var best: Parsed = null
    var bestConf = 0.0

    for ((rx, nGroups) <- patterns) {
      for (m <- rx.findAllMatchIn(lo)) {
        val amounts =
          if (nGroups == 2) for (a <- parseAmount(m.group(1)); b <- parseAmount(m.group(2))) yield (a, b, 0.9)
          else for (a <- parseAmount(m.group(1))) yield (a, a, 0.8)
        amounts.foreach { case (min0, max0, conf0) =>
          var (mn, mx) = (min0, max0)
          val currency =
            if (lo.contains("€") || lo.contains("eur") || lo.contains("euros")) {
              mn *= 655; mx *= 655; "EUR"
            } else if (lo.contains("$") || lo.contains("usd") || lo.contains("dollar")) {
              mn *= 600; mx *= 600; "USD"
            } else "FCFA"
          val period =
            if (Seq("an", "ans", "annuel", "year", "année").exists(lo.contains)) {
              mn /= 12; mx /= 12; "yearly"
            } else "monthly"
          var conf = conf0
          if (lo.contains("négociable") || lo.contains("à négocier")) conf *= 0.8
          if (lo.contains("selon expérience") || lo.contains("selon profil")) conf *= 0.9
          if (lo.contains("minimum")) conf *= 0.7
          if (conf > bestConf) {
            bestConf = conf
            best = Parsed(toIntField(mn), toIntField(mx),
              currency, period, conf.toFloat, "parsed")
          }
        }
      }
    }
    if (best == null) none else best
  }

  /** Inference grid (extract_salary.py:189-206), in insertion order —
    * first key contained in the title wins. */
  val salaryGrid: Seq[(String, (Int, Int))] = Seq(
    "junior" -> (150000, 400000), "senior" -> (500000, 1500000),
    "lead" -> (800000, 2500000), "manager" -> (1000000, 3000000),
    "développeur" -> (200000, 800000), "data scientist" -> (400000, 1200000),
    "devops" -> (350000, 1000000), "architecte" -> (600000, 1800000),
    "finance" -> (300000, 1000000), "tech" -> (250000, 900000),
    "marketing" -> (200000, 600000))

  /** F19 core: title-grid inference, +20% Abidjan, -10% CDD, conf 0.3. */
  def inferRange(title: String, location: String, contractType: String): Parsed = {
    val titleLo = Option(title).getOrElse("").toLowerCase
    val locLo = Option(location).getOrElse("").toLowerCase
    salaryGrid.collectFirst { case (k, (mn0, mx0)) if titleLo.contains(k) => (mn0, mx0) }
      .map { case (mn0, mx0) =>
        var (mn, mx) = (mn0.toLong, mx0.toLong)
        if (locLo.contains("abidjan")) { mn = (mn * 1.2).toLong; mx = (mx * 1.2).toLong }
        if (contractType != null && contractType.toLowerCase.contains("cdd")) {
          mn = (mn * 0.9).toLong; mx = (mx * 0.9).toLong
        }
        Parsed(Some(mn.toInt), Some(mx.toInt), "FCFA", "monthly", 0.3f, "inferred")
      }
      .getOrElse(none)
  }

  val parseComprehensiveUdf: UserDefinedFunction =
    udf((s: String, d: String, t: String) => parseComprehensive(s, d, t))

  val inferRangeUdf: UserDefinedFunction =
    udf((t: String, l: String, c: String) => inferRange(t, l, c))

  /** F20 as pure Column expressions over the parsed struct
    * (extract_salary.py:253-291). Python truthiness is part of the
    * semantics: a 0 amount counts as MISSING — (0, 500) backfills min
    * to 500 and (0, 0) yields a null average (golden-probed against
    * normalize_salary_udf). The average adds in DOUBLE (Python's
    * unbounded ints never overflow; int32 addition under ANSI would). */
  def normalized(parsed: Column): Column = {
    val mn = parsed.getField("salary_min")
    val mx = parsed.getField("salary_max")
    def truthy(c: Column): Column = c.isNotNull && c =!= 0
    val mnD = mn.cast("double"); val mxD = mx.cast("double")
    val (outMn, outMx, outAvg) = (
      when(truthy(mn) && truthy(mx), mn)
        .when(truthy(mn), mn).when(truthy(mx), mx).otherwise(mn),
      when(truthy(mn) && truthy(mx), mx)
        .when(truthy(mn), mn).when(truthy(mx), mx).otherwise(mx),
      when(truthy(mn) && truthy(mx), (mnD + mxD) / 2.0)
        .when(truthy(mn), mnD).when(truthy(mx), mxD)
        .otherwise(lit(null).cast("double")))
    struct(
      outMn.as("salary_min_fcfa"),
      outMx.as("salary_max_fcfa"),
      outAvg.cast("float").as("salary_avg_fcfa"),
      coalesce(parsed.getField("currency"), lit("FCFA")).as("currency_original"),
      coalesce(parsed.getField("period"), lit("monthly")).as("period_normalized"),
      coalesce(parsed.getField("confidence"), lit(0.0f)).as("confidence_score"),
      coalesce(parsed.getField("source"), lit("none")).as("data_source"))
  }
}
