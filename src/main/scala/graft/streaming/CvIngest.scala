package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.textkit.{Ids, Sectors, Skills}

/** The CV ingest leg — `consume_cvs.py` is declared but ABSENT in the
  * reference (PLAN_REALISATION.md:292-296: consume topic `cvs-raw`,
  * parse PDF/DOCX, extract CV structure, land partitioned parquet);
  * this reconstruction targets the Fact_CVs warehouse shape
  * (create_tables.sql:98-128) and mirrors the offers chain
  * ([[StreamingIngest]]/[[IngestTransform]]): fixed-schema JSON parse,
  * pure-projection structure extraction, partitioned checkpointed
  * append sink.
  *
  * The PDF/DOCX decode is an explicit seam (a deployment plugs a
  * Tika-like extractor; offline the envelope's plain text or a UTF-8
  * byte decode stands in — the same honest-stub pattern as
  * `Multimodal.StubCodec`). Everything downstream of the seam is real:
  * the structure extraction runs the SAME kernels the offers pipeline
  * uses (F8 skill catalog, F24 competence ids, F22 localisation ids,
  * salary-amount parse, F21 sector classification), all stateless
  * Column projections — the stream shuffles nothing.
  */
object CvIngest {

  /** Wire schema of the `cvs-raw` envelope: id + provenance + the raw
    * document (base64 PDF/DOCX bytes) and/or pre-extracted plain text.
    * Fixed-schema from_json: producer fields not declared here are
    * silently dropped, like the offers topic (S3). */
  val cvRaw: StructType = StructType(Seq(
    StructField("cv_id", StringType),
    StructField("scraped_at", StringType), // ISO-8601 string on the wire
    StructField("source_site", StringType),
    StructField("url_cv", StringType),
    StructField("content_type", StringType), // pdf | docx
    StructField("content_b64", StringType),
    StructField("text_content", StringType)))

  /** Value-only JSON-lines parse (the file-source path IngestSpec-style
    * tests drive; the Kafka leg reuses StreamingIngest.kafkaReader with
    * topic `cvs-raw` and this schema). Delegates to the SHARED parse
    * step — the offers leg and this one must not drift independently
    * (the same rule the shared sink step enforces). */
  def parseJsonValue(raw: DataFrame): DataFrame =
    IngestTransform.parseJsonValue(raw, cvRaw)

  /** Document-to-text seam: prefer the extractor's text, else decode
    * the document bytes (offline stand-in: UTF-8; production: the
    * PDF/DOCX extractor output published to `text_content`). */
  def extractedText: Column =
    coalesce(col("text_content"),
      decode(unbase64(col("content_b64")), "UTF-8"))

  private val contractTypes = Seq("CDI", "CDD", "Stage", "Freelance", "Alternance")
  private val certCatalog = Seq("aws certified", "pmp", "scrum master", "itil",
    "cisco ccna", "togaf", "prince2")
  private val langCatalog = Seq("français", "anglais", "espagnol", "allemand", "arabe")

  /** CV text -> Fact_CVs structure (create_tables.sql:98-128), as pure
    * Column projections over the parsed envelope. */
  def structure(parsed: DataFrame,
      clock: Option[java.sql.Timestamp] = None): DataFrame = {
    val text = extractedText
    val lo = lower(coalesce(text, lit("")))
    val city = regexp_extract(lo, "(?i)localisation\\s*:\\s*([\\p{L} '\\-]+)", 1)
    val years = nullif(regexp_extract(lo, "(\\d{1,2})\\s*(?:ans|années)", 1), lit(""))
    // "scrum master" is a certification (certCatalog extracts it), not
    // a degree — blank the collocation before the degree scan so a
    // scrum-master CV doesn't read as Master-level education
    val eduText = regexp_replace(lo, "scrum\\s*master", " ")
    val niveau = when(lo.contains("doctorat") || lo.contains("phd"), "Doctorat")
      .when(lo.contains("bac+5") || eduText.contains("master") || lo.contains("ingénieur"), "Master")
      .when(lo.contains("bac+3") || lo.contains("licence"), "Licence")
      .when(lo.contains("bac+2") || lo.contains("bts") || lo.contains("dut"), "BTS/DUT")
      .otherwise("Non spécifié")
    val contrat = contractTypes.foldRight(lit("Non spécifié"): Column) { (t, acc) =>
      when(lo.contains(t.toLowerCase), t).otherwise(acc)
    }
    val competences = Skills.extractSkills(text)
    val sector = Sectors.classifyUdf(lit(""), lit(""), text,
      when(city =!= "", city).otherwise(lit("")))
    parsed.select(
      col("cv_id"),
      years.cast("long").as("annees_experience"),
      niveau.as("niveau_etudes"),
      lit("Non spécifié").as("domaine_etudes"),
      Ids.localisationId(when(city =!= "", trim(city))).as("localisation_souhaitee_id"),
      sector.getField("secteur_id").as("secteur_souhaite_id"),
      Ids.parseSalaryAmount(text).cast("double").as("salaire_souhaite"),
      contrat.as("type_contrat_souhaite"),
      (lo.contains("télétravail") || lo.contains("remote")).as("teletravail_souhaite"),
      competences.as("competences"),
      transform(competences, c => Ids.competenceId(c)).as("competences_ids"),
      filter(typedLit(certCatalog.map(graft.textkit.Skills.pythonTitle)),
        c => lo.contains(lower(c))).as("certifications"),
      transform(
        filter(typedLit(langCatalog), l => lo.contains(l)),
        l => struct(initcap(l).as("langue"), lit("Non spécifié").as("niveau")))
        .as("langues"),
      col("source_site"),
      col("url_cv"),
      // try_to_timestamp: malformed producer timestamps must not kill
      // the long-running stream under ANSI (same policy as the offers
      // chain)
      try_to_timestamp(col("scraped_at")).as("scraped_at"),
      graft.stages.Stages.processedAt(clock).as("last_updated"),
      // "disponible immédiatement" is subsumed by the bare adverb —
      // one contains() covers both phrasings
      when(lo.contains("immédiatement"), "Immédiate")
        .otherwise("Non spécifié").as("disponibilite"),
      lit("actif").as("statut"),
      // partition column, mirroring the offers sink's scraped_date
      try_to_date(col("scraped_at")).as("scraped_date"))
  }

  /** Landing sink: append-mode parquet partitioned by (scraped_date,
    * source_site) — the file-layout analogue of Fact_CVs' PARTITION BY
    * DATE(scraped_at) / CLUSTER BY. Delegates to the offers sink chain
    * ([[StreamingIngest.parquetSink]]) so the two legs cannot drift. */
  def parquetSink(df: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")) =
    StreamingIngest.parquetSink(df, path, checkpoint, trigger,
      partitionCols = Seq("scraped_date", "source_site"))

  /** Whole leg for the file-based source (tests / offline replay):
    * JSON-lines dir -> parse -> structure -> partitioned sink. */
  def ingestFiles(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, clock: Option[java.sql.Timestamp] = None): Unit = {
    val raw = spark.readStream.schema("value STRING").text(inDir)
    val q = parquetSink(structure(parseJsonValue(raw), clock),
      outDir, checkpoint, Trigger.AvailableNow()).start()
    q.awaitTermination()
  }
}
