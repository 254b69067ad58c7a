package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark
import graft.queries.EventOps

/** Events-table schema CONTRACT: the engine accepts every ts encoding
  * the driver has shipped — raw int64 ns-since-epoch (plain and
  * TIMESTAMP(NANOS)-annotated, via nanosAsLong), TIMESTAMP(micros),
  * and TIMESTAMP_NTZ — and produces IDENTICAL results from each.
  *
  * Round 4 regressed exactly here: a testdata regeneration flipped
  * `ts` from ns-longs to TIMESTAMP micros and nine queries failed at
  * analysis with an opaque BINARY_OP_DIFF_TYPES. This suite is the
  * early-warning replacement: a future encoding drift fails ONE spec
  * that names the encoding, and the cross-encoding replay pins that
  * Engine.epochNs normalization is value-exact, not just analyzable.
  */
class EventSchemaContractSpec extends AnyFunSuite {

  import spark.implicits._

  /** (event_id, ns, user_id, type, value, props) spanning 3 days,
    * several users, view→click→purchase chains inside and outside the
    * one-hour attribution window, an inactivity gap larger than q99's
    * six-hour session gap, and a tail young enough to stay open under
    * its one-hour watermark — so every EventOps query produces
    * non-trivial output on the fixture. */
  private val baseNs = 1700000000L * 1000000000L // 2023-11-14 22:13:20 UTC
  private def ns(dayOff: Long, secOff: Long): Long =
    baseNs + (dayOff * 86400L + secOff) * 1000000000L

  private val eventRows: Seq[(Long, Long, Long, String, Double, String)] = {
    val perUser = for {
      u <- 1L to 3L
      (typ, d, sec) <- Seq(
        ("view", 0L, 100L + u), ("click", 0L, 400L + u),         // attributable
        ("purchase", 0L, 900L + u),
        ("view", 0L, 30000L + u), ("click", 0L, 30000L + 4000L + u), // outside 1h window
        ("view", 1L, 500L + u), ("click", 1L, 700L + u),
        ("purchase", 1L, 1200L + u),
        // > 6h gap inside day 2 → session break for q99
        ("view", 2L, 100L + u), ("click", 2L, 25000L + u))
    } yield (typ, d, sec)
    val rows = perUser.zipWithIndex.map { case ((typ, d, sec), i) =>
      val u = (i / 10) + 1L
      (i.toLong, ns(d, sec), u, typ, (i % 7) + 0.25, s"""{"k": ${i % 5}}""")
    }
    // one PRE-EPOCH event (negative ns): integer-division semantics at
    // negative timestamps must agree across encodings (and engines —
    // see the truncation test below), not just for the 2020s data the
    // driver happens to generate
    rows :+ (rows.size.toLong, -1500000000L * 1000000000L - 500000000L,
      1L, "view", 0.5, """{"k": 1}""")
  }

  private val customerRows: Seq[(Long, String)] =
    Seq((1L, "BUILDING"), (2L, "MACHINERY"), (3L, "BUILDING"))

  /** Spark writes a directory; the driver ships single FILES (and the
    * streaming reads glob on the literal file name) — coalesce to one
    * part and move it to `<dir>/<name>.parquet`. */
  private def writeSingleFile(df: DataFrame, dir: Path, name: String): Unit = {
    val tmp = Files.createTempDirectory("graft_evtw_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, dir.resolve(s"$name.parquet"))
    part.getParentFile.listFiles().foreach(_.delete()); tmp.toFile.delete()
  }

  private def writeFixture(tsEncoding: String): String = {
    val dir = Files.createTempDirectory(s"graft_events_${tsEncoding}_")
    val raw = eventRows.toDF("event_id", "ts_ns", "user_id", "event_type", "value", "props")
    val events = tsEncoding match {
      case "long" => raw.withColumn("ts", col("ts_ns"))
      case "micros" => raw.withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      // wall-clock NTZ (isAdjustedToUTC=false) — what Spark actually
      // infers from the driver's regenerated parquet; the session TZ
      // is UTC so the instant→wall-clock cast is value-preserving
      case "ntz" =>
        raw.withColumn("ts", timestamp_micros(expr("ts_ns div 1000")).cast("timestamp_ntz"))
    }
    val tsTypeKey = "spark.sql.parquet.outputTimestampType"
    val prior = spark.conf.get(tsTypeKey)
    spark.conf.set(tsTypeKey, "TIMESTAMP_MICROS") // what the driver ships
    try {
      writeSingleFile(
        events.select("event_id", "ts", "user_id", "event_type", "value", "props"),
        dir, "events")
      writeSingleFile(customerRows.toDF("c_custkey", "c_mktsegment"), dir, "customer")
    } finally spark.conf.set(tsTypeKey, prior)
    dir.toString
  }

  private lazy val longDir = writeFixture("long")
  private lazy val microsDir = writeFixture("micros")
  private lazy val ntzDir = writeFixture("ntz")

  test("fixtures carry the shipped encodings (int64 ns, timestamp micros, timestamp_ntz)") {
    assert(spark.read.parquet(s"$longDir/events.parquet").schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$microsDir/events.parquet").schema("ts").dataType.typeName
      == "timestamp")
    assert(spark.read.parquet(s"$ntzDir/events.parquet").schema("ts").dataType.typeName
      == "timestamp_ntz")
  }

  test("legacy TIMESTAMP(NANOS) parquet reads as exact ns longs (nanosAsLong path)") {
    // committed pyarrow fixture: INT64 annotated Timestamp(NANOS,
    // isAdjustedToUTC=false) — the encoding the driver shipped before
    // round 4, which Spark's reader refuses without the legacy conf.
    // This is the leg the Spark-written fixtures CANNOT produce (their
    // "long" column is unannotated int64), so the conf in
    // Engine.session/TestSpark stays load-bearing and tested.
    val df = spark.read.parquet(
      getClass.getResource("/events_nanos.parquet").getPath)
    assert(df.schema("ts").dataType == LongType)
    val got = df.select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1700000000123456789L, 1L -> 1700003600000000000L,
      2L -> -1500000000500000000L))
    assert(df.withColumn("ts", Engine.epochNs(df, "ts"))
      .schema("ts").dataType == LongType)
  }

  test("Engine.events normalizes both encodings to identical ns longs") {
    val a = Engine.events(spark, longDir)
    val b = Engine.events(spark, microsDir)
    assert(a.schema("ts").dataType == LongType && b.schema("ts").dataType == LongType)
    val av = a.select("event_id", "ts").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bv = b.select("event_id", "ts").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(av == bv && av.values.toSet == eventRows.map(_._2).toSet)
  }

  test("epochNs rejects a non-event-time column by naming its type") {
    val err = intercept[IllegalArgumentException] {
      Engine.epochNs(new StructType().add("ts", "string"), "ts")
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("ts integer division truncates toward zero, matching DuckDB //") {
    // DuckDB: -7 // 2 = -3 and -7 % 2 = -1 (truncation + sign-keeping
    // remainder, verified against duckdb directly) — the same semantics
    // as Spark's `div` and `%`. Pin Spark's side so pre-epoch
    // timestamps bucket identically in every engine pair; if either
    // engine ever switched to floor division these expectations break.
    val got = Seq(-7L, 7L, -1500000000L, 1500000000L).toDF("ts")
      .selectExpr("ts div 1000000000 AS d", "ts % 3600 AS m")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, -7L), (0L, 7L), (-1L, -2400L), (1L, 2400L)))
  }

  test("every EventOps query returns identical results on all encodings") {
    def runAll(dir: String): Map[String, (String, Seq[String])] =
      EventOps.all.map { q =>
        val df = q.fn(spark, dir)
        q.name -> (df.schema.catalogString, df.collect().toSeq.map(_.toString))
      }.toMap
    val onLong = runAll(longDir)
    Seq("micros" -> runAll(microsDir), "ntz" -> runAll(ntzDir)).foreach {
      case (enc, results) =>
        EventOps.all.foreach { q =>
          assert(onLong(q.name)._1 == results(q.name)._1, s"${q.name} ($enc): schema drift")
          assert(onLong(q.name)._2 == results(q.name)._2, s"${q.name} ($enc): row drift")
          assert(onLong(q.name)._2.nonEmpty, s"${q.name}: fixture produced no rows")
        }
    }
  }
}
