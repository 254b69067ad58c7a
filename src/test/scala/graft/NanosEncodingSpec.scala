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

/** TIMESTAMP(NANOS) columns — the third temporal drift leg, and the
  * one that weaponizes the session's own `nanosAsLong=true` conf: a
  * pandas/pyarrow regeneration that skips `coerce_timestamps` ships
  * datetime64[ns] date columns as parquet TIMESTAMP(NANOS), which the
  * conf (required since round 4 for the events.ts ns fixtures)
  * surfaces as raw ns-since-epoch LONGs — so every date function on
  * o_orderdate/l_shipdate dies at ANALYSIS while the DuckDB oracle
  * (native TIMESTAMP_NS) sails through, a red gate with no value diff
  * anywhere. `Engine.recoverNanosTimestamps` reads the parquet FOOTER
  * (the Spark schema has already erased the annotation) and rebuilds
  * the micros-precision timestamp; events.ts is EXEMPT by name —
  * epochNs owns that column and its exact-ns integer path must not be
  * truncated to micros.
  *
  * Spark's writer cannot emit NANOS (it writes INT96/MICROS/MILLIS
  * only), so like UnsignedEncodingSpec this spec hand-writes the
  * variant through parquet-java's example Group API. Three layers:
  * fixture-degeneracy (footers really carry NANOS), the mapping
  * premise (raw read yields LongType under nanosAsLong), and
  * value-identity through Engine.table + the temporal consumers.
  */
class NanosEncodingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val canonical = "/root/testdata/sf0.001"

  /** Tables with timestamp columns get the ns recode; everything else
    * is byte-copied so the consumers see a complete sf dir. */
  private val recoded = Seq("orders", "lineitem", "events")

  /** The queries that read the recoded columns: o_orderdate filters/
    * projections (q02), l_shipdate windows (q08), date functions
    * (q14), and the events leg (q27 batch + q30 streaming) that must
    * keep its exact-ns path through the exemption. */
  private val consumers = Seq(
    "q02_filter_project",
    "q08_window_running",
    "q14_date_funcs",
    "q27_time_bucket_agg")

  private var root: Path = _
  private var nanosDir: String = _
  private var ltzDir: String = _

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("graft_nanos_enc")
    val dir = root.resolve("nanos")
    Files.createDirectories(dir)
    Engine.tableNames.foreach { t =>
      if (recoded.contains(t))
        writeNanos(spark.read.parquet(s"$canonical/$t.parquet"),
          dir.resolve(s"$t.parquet").toString)
      else
        Files.copy(java.nio.file.Paths.get(s"$canonical/$t.parquet"),
          dir.resolve(s"$t.parquet"))
    }
    nanosDir = dir.toString
    // second variant: tz-AWARE ns (isAdjustedToUTC=true — pandas
    // datetime64[ns, UTC]) and DIRECTORY-shaped (two part files), so
    // both recovery branches and the multi-file footer probe are
    // exercised. orders only — one table pins both legs.
    val ltz = root.resolve("ltz")
    Files.createDirectories(ltz)
    val tableDir = ltz.resolve("orders.parquet")
    Files.createDirectories(tableDir)
    val odf = spark.read.parquet(s"$canonical/orders.parquet")
    val half = odf.count() / 2
    writeNanos(odf.where(org.apache.spark.sql.functions.col("o_orderkey") <= half),
      tableDir.resolve("part-0.parquet").toString, adjustedToUtc = true)
    writeNanos(odf.where(org.apache.spark.sql.functions.col("o_orderkey") > half),
      tableDir.resolve("part-1.parquet").toString, adjustedToUtc = true)
    ltzDir = ltz.toString
  }

  override def afterAll(): Unit = {
    val stream = Files.walk(root)
    try stream.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
    finally stream.close()
  }

  /** Re-emit `df` with every timestamp column as INT64
    * TIMESTAMP(isAdjustedToUTC=false, NANOS) — the pyarrow
    * datetime64[ns] no-tz layout — and every other column in its
    * canonical annotation. Values are micros*1000, the exact recode a
    * ns regeneration of micros-precision data would carry. */
  private def writeNanos(df: DataFrame, outFile: String,
      adjustedToUtc: Boolean = false): Unit = {
    val fields = df.schema.fields
    val schema: MessageType = {
      val b = Types.buildMessage()
      fields.foreach { f =>
        val t = f.dataType match {
          case TimestampNTZType | TimestampType =>
            Types.optional(PrimitiveTypeName.INT64)
              .as(LogicalTypeAnnotation.timestampType(adjustedToUtc, TimeUnit.NANOS))
          case LongType    => Types.optional(PrimitiveTypeName.INT64)
          case IntegerType => Types.optional(PrimitiveTypeName.INT32)
          case DoubleType  => Types.optional(PrimitiveTypeName.DOUBLE)
          case StringType =>
            Types.optional(PrimitiveTypeName.BINARY)
              .as(LogicalTypeAnnotation.stringType())
          case other =>
            fail(s"writeNanos has no parquet mapping for ${f.name}: $other — " +
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
            case TimestampNTZType =>
              val inst = row.getAs[java.time.LocalDateTime](i).toInstant(ZoneOffset.UTC)
              g.add(f.name, (inst.getEpochSecond * 1000000L + inst.getNano / 1000L) * 1000L)
            case TimestampType =>
              val ts = row.getAs[java.sql.Timestamp](i)
              g.add(f.name, (ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L) * 1000L)
            case LongType    => g.add(f.name, row.getLong(i))
            case IntegerType => g.add(f.name, row.getInt(i))
            case DoubleType  => g.add(f.name, row.getDouble(i))
            case StringType  => g.add(f.name, row.getString(i))
            case other => fail(s"unreachable: $other survived schema mapping")
          }
        }
        writer.write(g)
      }
    } finally writer.close()
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("nanos tables really carry INT64 TIMESTAMP(NANOS)") {
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new HadoopPath(s"$nanosDir/orders.parquet"), conf))
    val t = try {
      val s = reader.getFooter.getFileMetaData.getSchema
      s.getType(s.getFieldIndex("o_orderdate")).asPrimitiveType()
    } finally reader.close()
    assert(t.getPrimitiveTypeName == PrimitiveTypeName.INT64 &&
      t.getLogicalTypeAnnotation ==
        LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS),
      s"fixture degenerated: o_orderdate is $t (${t.getLogicalTypeAnnotation}) — " +
        "NANOS annotation not applied")
  }

  test("nanosAsLong surfaces NANOS date columns as raw LONGs (the premise)") {
    // a raw read, NOT Engine.table — pins the Spark behavior the
    // recovery exists to absorb; if a Spark upgrade starts reading
    // NANOS natively, fail here by name and retire the recovery
    val raw = spark.read.parquet(s"$nanosDir/orders.parquet").schema
    assert(raw("o_orderdate").dataType == LongType,
      s"Spark now reads TIMESTAMP(NANOS) as ${raw("o_orderdate").dataType} — " +
        "revisit recoverNanosTimestamps' premise")
  }

  test("Engine.table recovers NANOS date columns to micros timestamps, value-identical") {
    Seq("orders", "lineitem").foreach { t =>
      val got = Engine.table(spark, nanosDir, t)
      val tsCols = Engine.table(spark, canonical, t).schema.fields.collect {
        case f if f.dataType == TimestampNTZType || f.dataType == TimestampType => f.name
      }
      assert(tsCols.nonEmpty, s"$t has no timestamp columns — pins nothing")
      tsCols.foreach { c =>
        assert(got.schema(c).dataType == TimestampNTZType,
          s"$t.$c recovered as ${got.schema(c).dataType} — expected the NTZ the " +
            "wall-clock annotation declares")
      }
      assert(rows(got) == rows(Engine.table(spark, canonical, t)),
        s"$t drifted under TIMESTAMP(NANOS) backing")
    }
  }

  test("events.ts stays an exact ns LONG through the exemption") {
    // epochNs owns ts: the recovery truncating it to micros would
    // silently lose genuine sub-microsecond event times, so the
    // events table must surface ts as the raw ns long epochNs expects
    val ev = Engine.table(spark, nanosDir, "events")
    assert(ev.schema("ts").dataType == LongType,
      s"events.ts recovered to ${ev.schema("ts").dataType} — the exemption broke " +
        "and epochNs lost its exact-ns integer path")
    val want = rows(Engine.events(spark, canonical)
      .select("event_id", "ts"))
    assert(rows(Engine.events(spark, nanosDir).select("event_id", "ts")) == want,
      "Engine.events drifted under ns-annotated event time")
  }

  test("tz-aware NANOS in a multi-file dir recovers to LTZ, value-identical") {
    // the isAdjustedToUTC=true branch (pandas datetime64[ns, UTC])
    // produces TimestampType — an instant, no session-zone require —
    // and the footer probe must find the annotation through a
    // DIRECTORY-shaped table (first leaf file)
    val got = Engine.table(spark, ltzDir, "orders")
    assert(got.schema("o_orderdate").dataType == TimestampType,
      s"tz-aware NANOS recovered as ${got.schema("o_orderdate").dataType} — " +
        "expected the LTZ instant the utc annotation declares")
    // canonical is NTZ wall-clock; under the pinned UTC session the
    // LTZ instant renders the same wall-clock, so compare through an
    // explicit epoch projection to stay type-agnostic
    import org.apache.spark.sql.functions.{col, unix_micros}
    def epochs(df: DataFrame) = rows(df.select(col("o_orderkey"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("us")))
    assert(epochs(got) == epochs(Engine.table(spark, canonical, "orders")),
      "orders drifted under tz-aware multi-file TIMESTAMP(NANOS)")
  }

  // q30 drives the streaming leg: the event stream's batch-inferred
  // schema carries the ns LONG and epochNs dispatches on it inside
  // real MicroBatchExecution — the ts exemption must hold there too
  (consumers :+ "q30_stream_window_agg").foreach { q =>
    test(s"$q is value-identical under TIMESTAMP(NANOS) backing") {
      val fn = SparkEntry.queries(q)
      val want = rows(fn(spark, canonical))
      assert(want.nonEmpty, s"$q returned no rows on canonical sf0.001 — pins nothing")
      assert(rows(fn(spark, nanosDir)) == want,
        s"$q drifted under TIMESTAMP(NANOS) backing")
    }
  }
}
