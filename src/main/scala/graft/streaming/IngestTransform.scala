package graft.streaming

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** The streaming-ingest transform chain (consume_jobs.py:105-139),
  * shared verbatim between the Kafka stream and the file-based test
  * source — parse, flatten, derive date parts, cleanse, impute.
  * All pure projections: stateless, append-mode, shuffle-free.
  */
object IngestTransform {

  /** Kafka key/value decode + fixed-schema JSON parse (S2+S3). Fields
    * not in the declared 17-field schema are silently dropped. */
  def parseKafka(raw: DataFrame): DataFrame =
    raw
      .selectExpr("CAST(key AS STRING) AS kafka_key", "CAST(value AS STRING) AS json_value")
      .select(col("kafka_key"),
        from_json(col("json_value"), Schemas.jobOfferRaw).as("job_data"))
      .select(col("kafka_key"), col("job_data.*"))

  /** Value-only JSON-lines parse, parameterized by schema so the offer
    * and CV legs share ONE parse step (a corrupt-record policy fix
    * must land on both at once — the same anti-drift rule the shared
    * sink step follows). */
  def parseJsonValue(raw: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame =
    raw
      .select(from_json(col("value"), schema).as("parsed"))
      .select(col("parsed.*"))

  /** Same parse for a value-only JSON-lines source (offline tests). */
  def parseJsonValue(raw: DataFrame): DataFrame =
    parseJsonValue(raw, Schemas.jobOfferRaw)

  private def cleanWs(c: Column): Column = regexp_replace(c, "\\s+", " ")

  /** Derived columns + cleansing (consume_jobs.py:116-139). */
  def enrich(parsed: DataFrame,
      clock: Option[java.sql.Timestamp] = None): DataFrame =
    parsed
      // try_to_date: a producer sending a non-ISO timestamp must yield a
      // null date (Spark 3 behavior the reference relies on), not crash
      // the long-running stream under ANSI mode
      .withColumn("scraped_date", try_to_date(col("scraped_at")))
      .withColumn("scraped_year", year(col("scraped_date")))
      .withColumn("scraped_month", month(col("scraped_date")))
      .withColumn("scraped_day", dayofmonth(col("scraped_date")))
      .withColumn("processed_at", graft.stages.Stages.processedAt(clock))
      .withColumn("salary_amount", col("salary.amount"))
      .withColumn("salary_currency", col("salary.currency"))
      .withColumn("salary_period", col("salary.period"))
      .withColumn("title", cleanWs(col("title")))
      .withColumn("company", cleanWs(col("company")))
      .withColumn("location", cleanWs(col("location")))
      .withColumn("contract_type",
        when(col("contract_type").isNull, "Non spécifié").otherwise(col("contract_type")))
      .withColumn("experience_level",
        when(col("experience_level").isNull, "Non spécifié").otherwise(col("experience_level")))
      .withColumn("industry",
        when(col("industry").isNull, "Autre").otherwise(col("industry")))

  /** Dedup-at-ingest: the reference's landing is at-least-once with no
    * watermark (SURVEY §2.10), so replayed offers land twice. This
    * variant drops duplicate job_ids within the watermark horizon —
    * state is bounded by (ids seen in `horizon`), keyed state sharded
    * on job_id. Works on both streaming and batch frames. */
  def withIngestDedup(enriched: DataFrame, horizon: String = "1 hour"): DataFrame = {
    // try_to_timestamp: under ANSI mode a malformed scraped_at would
    // otherwise CAST-error and kill the long-running stream — malformed
    // falls back to processed_at exactly like null (same policy as
    // enrich()'s try_to_date)
    val withEventTime = enriched.withColumn("event_time",
      coalesce(try_to_timestamp(col("scraped_at")), col("processed_at")))
    // NULL job_ids pass through undeduplicated: dropDuplicates treats
    // null keys as EQUAL, so two genuinely different offers whose JSON
    // lacks job_id (from_json nulls missing fields) would collapse to
    // one survivor — only replays of an identifiable id are dups
    if (enriched.isStreaming) {
      // dropDuplicatesWithinWatermark is the state-EVICTING form: plain
      // dropDuplicates(subset-without-event-time) never purges state
      val wm = withEventTime.withWatermark("event_time", horizon)
      wm.where(col("job_id").isNotNull)
        .dropDuplicatesWithinWatermark("job_id")
        .unionByName(wm.where(col("job_id").isNull))
        .drop("event_time")
    } else
      withEventTime.where(col("job_id").isNotNull).dropDuplicates("job_id")
        .unionByName(withEventTime.where(col("job_id").isNull))
        .drop("event_time")
  }
}
