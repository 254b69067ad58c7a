package graft

import java.nio.file.{Files, Path}
import java.time.ZoneOffset
import java.util.Comparator

import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** UNSIGNED-integer parquet annotations — the key-column drift class
  * LayoutEncodingSpec's writer can't produce (Spark has no unsigned
  * types, so `df.write` can never emit a UINT annotation; this spec
  * writes the files itself through parquet-java's example Group API,
  * the same writer path old MapReduce jobs shipped).
  *
  * The scenario: the driver's generator builds id columns with numpy
  * `uint64`/`uint32` arrays and pyarrow faithfully annotates them
  * `INT(64,false)` / `INT(32,false)`. Spark's schema converter then
  * reads uint64 as DECIMAL(20,0) (SPARK-34817 — the only Spark type
  * that holds the full unsigned range) and uint32 as LongType. Every
  * long-typed join key in the engine would flip to decimal at
  * analysis time — exactly the class `Engine.canonicalNumerics`
  * normalizes (scale-0 decimal → long), and uint32→long is the
  * int-vs-long key-width latitude KeyWidthEncodingSpec already pins.
  *
  * Three layers of pins, so a failure names its cause:
  *  1. fixture-degeneracy: the footers really carry `isSigned=false`;
  *  2. the Spark MAPPING assumption itself: a raw (non-Engine) read
  *     of the variant yields DECIMAL(20,0) / LongType — if a Spark
  *     upgrade ever changes the converter, this fails by name instead
  *     of the consumers chasing phantom value diffs;
  *  3. table-level round-trips and consumer queries value-identical
  *     to the canonical layout through `Engine.table`.
  *
  * Only the tables the consumer queries read are rebuilt (lineitem,
  * orders, customer, nation, region, documents, events — all
  * primitive-columned; embeddings' array column has a separate
  * legacy-list variant in LayoutEncodingSpec).
  */
class UnsignedEncodingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val canonical = "/root/testdata/sf0.001"

  private val tables = Seq(
    "lineitem", "orders", "customer", "nation", "region", "documents", "events")

  /** Consumers that actually CONSUME the recoded integer columns
    * (q01-style aggregates never touch the keys and would pin
    * nothing): q02 outputs l_orderkey/l_linenumber, q03 joins the
    * whole key chain lineitem→orders→customer→nation→region, q16
    * groups documents and emits min(doc_id), q27 buckets events and
    * groups on the uint64-backed user_id-adjacent stream. */
  private val consumers = Seq(
    "q02_filter_project",
    "q03_star_join",
    "q16_exact_dedup",
    "q27_time_bucket_agg")

  private var root: Path = _
  private var unsignedDir: String = _
  private var nsUintDir: String = _

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("graft_unsigned_enc")
    val dir = root.resolve("unsigned")
    Files.createDirectories(dir)
    tables.foreach { t =>
      val df = spark.read.parquet(s"$canonical/$t.parquet")
      writeUnsigned(df, dir.resolve(s"$t.parquet").toString)
    }
    unsignedDir = dir.toString
    // the sharpest event-time drift: ts as a numpy-uint64 NANOSECOND
    // column (the legacy int64-ns fixture class, unsigned-annotated) —
    // Spark reads DECIMAL(20,0), canonicalNumerics folds it to long,
    // epochNs takes the ns-long path; BOTH read paths (batch
    // Engine.events and streaming StreamingIngest.eventStream) must
    // normalize BEFORE epochNs dispatches or the decimal ts kills them
    val nsDir = root.resolve("nsuint")
    Files.createDirectories(nsDir)
    val ev = spark.read.parquet(s"$canonical/events.parquet")
    writeUnsigned(ev.withColumn("ts", Engine.epochNs(ev, "ts")),
      nsDir.resolve("events.parquet").toString)
    nsUintDir = nsDir.toString
  }

  override def afterAll(): Unit = {
    val stream = Files.walk(root)
    try stream.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
    finally stream.close()
  }

  /** Re-emit `df` as a single parquet file whose integer columns carry
    * UNSIGNED logical-type annotations; every other column keeps its
    * canonical annotation (UTF8 strings, MICROS timestamps), so the
    * variant isolates the one drift under test. Values are unchanged
    * (driver ids are non-negative, so the unsigned reinterpretation is
    * the identity on the bits). */
  private def writeUnsigned(df: DataFrame, outFile: String): Unit = {
    val fields = df.schema.fields
    val schema: MessageType = {
      val b = Types.buildMessage()
      fields.foreach { f =>
        val t = f.dataType match {
          case LongType =>
            Types.optional(PrimitiveTypeName.INT64)
              .as(LogicalTypeAnnotation.intType(64, false))
          case IntegerType =>
            Types.optional(PrimitiveTypeName.INT32)
              .as(LogicalTypeAnnotation.intType(32, false))
          case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE)
          case StringType =>
            Types.optional(PrimitiveTypeName.BINARY)
              .as(LogicalTypeAnnotation.stringType())
          case TimestampNTZType =>
            Types.optional(PrimitiveTypeName.INT64)
              .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS))
          case TimestampType =>
            Types.optional(PrimitiveTypeName.INT64)
              .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS))
          case DateType =>
            Types.optional(PrimitiveTypeName.INT32)
              .as(LogicalTypeAnnotation.dateType())
          case other =>
            fail(s"writeUnsigned has no parquet mapping for ${f.name}: $other — " +
              "extend the writer before adding a table with this type")
        }
        b.addField(t.named(f.name))
      }
      b.named("spark_schema")
    }
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter.builder(new HadoopPath(outFile))
      .withType(schema)
      .withConf(spark.sparkContext.hadoopConfiguration)
      .build()
    try {
      df.collect().foreach { row =>
        val g = factory.newGroup()
        fields.zipWithIndex.foreach { case (f, i) =>
          if (!row.isNullAt(i)) f.dataType match {
            case LongType    => g.add(f.name, row.getLong(i))
            case IntegerType => g.add(f.name, row.getInt(i))
            case DoubleType  => g.add(f.name, row.getDouble(i))
            case StringType  => g.add(f.name, row.getString(i))
            case TimestampNTZType =>
              // wall-clock-as-UTC, matching the canonical pyarrow
              // no-tz micros encoding (session TZ is pinned UTC)
              val inst = row.getAs[java.time.LocalDateTime](i).toInstant(ZoneOffset.UTC)
              g.add(f.name, inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
            case TimestampType =>
              val ts = row.getAs[java.sql.Timestamp](i)
              g.add(f.name, ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L)
            case DateType =>
              g.add(f.name, row.getAs[java.sql.Date](i).toLocalDate.toEpochDay.toInt)
            case other => fail(s"unreachable: $other survived schema mapping")
          }
        }
        writer.write(g)
      }
    } finally writer.close()
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def footerType(table: String, column: String) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new HadoopPath(s"$unsignedDir/$table.parquet"), conf))
    try {
      val s = reader.getFooter.getFileMetaData.getSchema
      s.getType(s.getFieldIndex(column)).asPrimitiveType()
    } finally reader.close()
  }

  test("unsigned tables really carry UINT annotations") {
    val k64 = footerType("lineitem", "l_orderkey")
    assert(k64.getLogicalTypeAnnotation == LogicalTypeAnnotation.intType(64, false),
      s"fixture degenerated: l_orderkey is ${k64.getLogicalTypeAnnotation} — " +
        "unsigned annotation not applied")
    val k32 = footerType("nation", "n_nationkey")
    assert(k32.getLogicalTypeAnnotation == LogicalTypeAnnotation.intType(32, false),
      s"fixture degenerated: n_nationkey is ${k32.getLogicalTypeAnnotation}")
  }

  test("Spark maps uint64 to DECIMAL(20,0) and uint32 to LONG (the premise)") {
    // a raw read, NOT Engine.table — this pins the Spark schema
    // converter behavior canonicalNumerics exists to absorb; if a
    // Spark upgrade changes the mapping, fail here by name
    val raw = spark.read.parquet(s"$unsignedDir/lineitem.parquet").schema
    assert(raw("l_orderkey").dataType == DecimalType(20, 0),
      s"Spark now reads uint64 as ${raw("l_orderkey").dataType} — " +
        "revisit canonicalNumerics' premise")
    assert(raw("l_linenumber").dataType == LongType,
      s"Spark now reads uint32 as ${raw("l_linenumber").dataType}")
  }

  test("Engine.table round-trips unsigned tables value-identically") {
    tables.foreach { t =>
      val want = rows(Engine.table(spark, canonical, t))
      val got = rows(Engine.table(spark, unsignedDir, t))
      assert(got == want, s"$t drifted under UINT annotations — " +
        "canonicalNumerics/epochNs round-trip broke")
    }
  }

  test("scale-0 DECIMAL keys beyond Long.MaxValue fail loudly, never silent-null") {
    // canonicalNumerics casts scale-0 decimals to long; DECIMAL(20,0)
    // exists precisely because it holds the full uint64 range Long
    // cannot, so an id >= 2^63 must DIE NAMED — since round 11 on the
    // guard's own bound-check message (which fires before the cast in
    // either ANSI regime); Spark's CAST_OVERFLOW is also accepted so a
    // future expression-reorder that lets the ANSI cast throw first
    // still counts as loud
    val dir = root.resolve("overflow")
    Files.createDirectories(dir)
    spark.sql("SELECT CAST('9223372036854775808' AS DECIMAL(20,0)) AS id")
      .write.mode("overwrite").parquet(dir.resolve("t.parquet").toString)
    val e = intercept[Exception] {
      Engine.table(spark, dir.toString, "t").collect()
    }
    val msg = String.valueOf(e.getMessage) +
      String.valueOf(Option(e.getCause).map(_.getMessage).orNull)
    assert(msg.contains("exceeds the int64 range") ||
      msg.toUpperCase.contains("OVERFLOW") || msg.contains("cannot be represented"),
      s"over-long decimal key failed, but not by naming the overflow: $msg")
  }

  test("the overflow guard fires even with ANSI casts disabled (no silent null)") {
    // the ANSI-on leg above rides Spark's own CAST_OVERFLOW; a library
    // consumer running spark.sql.ansi.enabled=false would instead get
    // the non-ANSI cast's silent NULL — a nulled join key that drops
    // rows with no error anywhere (round-10 ADVICE). canonicalNumerics
    // now guards scale-0 decimals wider than 18 digits with an explicit
    // raise_error, so the failure is named in BOTH cast regimes.
    val dir = root.resolve("overflow_noansi")
    Files.createDirectories(dir)
    spark.sql("SELECT CAST('9223372036854775808' AS DECIMAL(20,0)) AS id")
      .write.mode("overwrite").parquet(dir.resolve("t.parquet").toString)
    val key = "spark.sql.ansi.enabled"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val e = intercept[Exception] {
        Engine.table(spark, dir.toString, "t").collect()
      }
      val msg = String.valueOf(e.getMessage) +
        String.valueOf(Option(e.getCause).map(_.getMessage).orNull)
      assert(msg.contains("canonicalNumerics") && msg.contains("int64 range"),
        s"non-ANSI over-long decimal key must die on the named guard, got: $msg")
    } finally spark.conf.set(key, prior)
  }

  test("in-range DECIMAL(20,0) keys still flow through the guard untouched") {
    // the guard must be inert on sane data — including Long.MaxValue
    // itself and NULL ids (isNotNull gate)
    val dir = root.resolve("inrange")
    Files.createDirectories(dir)
    spark.sql(
      "SELECT * FROM VALUES (CAST('9223372036854775807' AS DECIMAL(20,0)))," +
        "(CAST(42 AS DECIMAL(20,0))),(CAST(NULL AS DECIMAL(20,0))) AS t(id)")
      .write.mode("overwrite").parquet(dir.resolve("t.parquet").toString)
    val got = Engine.table(spark, dir.toString, "t")
    assert(got.schema("id").dataType == LongType)
    assert(got.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .toSet == Set(Some(Long.MaxValue), Some(42L), None))
  }

  consumers.foreach { q =>
    test(s"$q is value-identical under UINT-annotated key columns") {
      val fn = SparkEntry.queries(q)
      val want = rows(fn(spark, canonical))
      assert(want.nonEmpty, s"$q returned no rows on canonical sf0.001 — pins nothing")
      assert(rows(fn(spark, unsignedDir)) == want,
        s"$q drifted under UINT-annotated key columns")
    }
  }

  /** Both event-time read paths against the uint64-ns ts: q27 drives
    * batch (Engine.events), q30 drives real MicroBatchExecution
    * (StreamingIngest.eventStream). The streaming leg is the
    * regression pin for normalize-before-epochNs ordering — with the
    * normalization applied after epochNs, the decimal-typed ts throws
    * in streaming while every batch query passes. */
  Seq("q27_time_bucket_agg", "q30_stream_window_agg").foreach { q =>
    test(s"$q is value-identical under uint64-NANOSECOND event time") {
      val fn = SparkEntry.queries(q)
      val want = rows(fn(spark, canonical))
      assert(want.nonEmpty, s"$q returned no rows on canonical sf0.001 — pins nothing")
      assert(rows(fn(spark, nsUintDir)) == want,
        s"$q drifted under uint64-ns event time")
    }
  }
}
