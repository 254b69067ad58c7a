package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The dashboard query surface (PLAN_REALISATION.md:479-527) as named
  * DataFrame queries over the enriched offers table. These define the
  * analytic workload the warehouse must answer; all are single-shuffle
  * grouped aggregations or windowed top-k.
  */
object Analytics {

  /** Offers per day (trend line). */
  def offersPerDay(offers: DataFrame): DataFrame =
    offers.groupBy(to_date(col("parsed_at")).as("day"))
      .agg(count(lit(1)).as("n_offers"))
      .orderBy(col("day"))

  /** Top-N skills overall. */
  def topSkills(offers: DataFrame, n: Int = 10): DataFrame =
    offers.select(explode(col("skills")).as("skill"))
      .groupBy("skill").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("skill")).limit(n)

  /** Salary distribution by sector and experience level. The enriched
    * offers frame carries no niveau_experience column (that lives in
    * the warehouse fact) — derive it from title/description when
    * absent, exactly as StarSchema.factOffres does. */
  def salaryBySectorExperience(offers: DataFrame): DataFrame = {
    val withLevel =
      if (offers.columns.contains("niveau_experience")) offers
      else offers.withColumn("niveau_experience",
        graft.textkit.Ids.inferExperienceLevel(col("title"), col("description")))
    withLevel
      .where(col("salary_avg_fcfa").isNotNull)
      .groupBy("secteur_id", "niveau_experience")
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("salary_avg_fcfa")), 2).as("avg_salary"),
        round(min(col("salary_min_fcfa")), 2).as("min_salary"),
        round(max(col("salary_max_fcfa")), 2).as("max_salary"))
  }

  /** Contract-type breakdown. */
  def contractMix(offers: DataFrame): DataFrame =
    offers.groupBy("contract_type").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("contract_type"))

  /** Top-N skills within each sector (explode -> count -> rank<=N). */
  def skillsBySector(offers: DataFrame, n: Int = 10): DataFrame = {
    val counts = offers
      .select(col("secteur_id"), explode(col("skills")).as("skill"))
      .groupBy("secteur_id", "skill").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("secteur_id"))
      .orderBy(desc("n"), col("skill"))
    counts.withColumn("rank", row_number().over(w)).where(col("rank") <= n)
  }
}
