package graft

import java.nio.file.{Files, Path}
import java.time.ZoneOffset
import java.util.Comparator

import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.column.Encoding
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

/** BYTE_STREAM_SPLIT pages — the float-column encoding drift with a
  * sharper edge than the v2/zstd classes LayoutEncodingSpec pins:
  * parquet-mr and DuckDB both decode it, but Spark's VECTORIZED
  * reader does not (SparkUnsupportedOperationException at execution,
  * caught by the round-11 `bss` drift rehearsal — 27 of 101 queries
  * died). A pyarrow `use_byte_stream_split` recode of the money/value
  * columns would therefore kill every consumer at run time with the
  * schema looking perfectly normal.
  *
  * `Engine.byteStreamSplitSafePath` absorbs it: the footer probe
  * detects BSS pages and restages the table once through the
  * NON-vectorized reader (conf scoped around the eager scratch write)
  * into standard encodings; batch reads and the streaming event
  * source share the helper. Spark's own writer never emits BSS, so
  * the fixture is hand-written through parquet-java's Group API with
  * `withByteStreamSplitEncoding(true)` (dictionary off — the writer
  * prefers dictionary pages otherwise).
  */
class BssEncodingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val canonical = "/root/testdata/sf0.001"

  /** lineitem carries the money doubles (q01's aggregate inputs);
    * events carries `value` and drives the streaming leg. */
  private val recoded = Seq("lineitem", "events")

  private var root: Path = _
  private var bssDir: String = _
  private var mixedDir: String = _

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("graft_bss_enc")
    val dir = root.resolve("bss")
    Files.createDirectories(dir)
    Engine.tableNames.foreach { t =>
      if (recoded.contains(t))
        writeBss(spark.read.parquet(s"$canonical/$t.parquet"),
          dir.resolve(s"$t.parquet").toString)
      else
        Files.copy(java.nio.file.Paths.get(s"$canonical/$t.parquet"),
          dir.resolve(s"$t.parquet"))
    }
    bssDir = dir.toString
    // MIXED multi-file dir: part-0 standard encodings, part-1 BSS —
    // the mixed-writer/append shape where a single-leaf footer sample
    // would miss the BSS fact (plain file deliberately named to sort
    // FIRST, the order local listings usually return) and the
    // un-restaged scan would die at execution
    val mixed = root.resolve("mixed")
    val tableDir = mixed.resolve("lineitem.parquet")
    Files.createDirectories(tableDir)
    val ldf = spark.read.parquet(s"$canonical/lineitem.parquet")
    import org.apache.spark.sql.functions.col
    writeBss(ldf.where(col("l_orderkey") % 2 === 0),
      tableDir.resolve("part-0.parquet").toString, bss = false)
    writeBss(ldf.where(col("l_orderkey") % 2 === 1),
      tableDir.resolve("part-1.parquet").toString, bss = true)
    mixedDir = mixed.toString
  }

  override def afterAll(): Unit = {
    val stream = Files.walk(root)
    try stream.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
    finally stream.close()
  }

  /** Re-emit `df` with BYTE_STREAM_SPLIT float/double pages (canonical
    * annotations everywhere, values unchanged — a pure encoding
    * drift). */
  private def writeBss(df: DataFrame, outFile: String, bss: Boolean = true): Unit = {
    val fields = df.schema.fields
    val schema: MessageType = {
      val b = Types.buildMessage()
      fields.foreach { f =>
        val t = f.dataType match {
          case DoubleType  => Types.optional(PrimitiveTypeName.DOUBLE)
          case LongType    => Types.optional(PrimitiveTypeName.INT64)
          case IntegerType => Types.optional(PrimitiveTypeName.INT32)
          case StringType =>
            Types.optional(PrimitiveTypeName.BINARY)
              .as(LogicalTypeAnnotation.stringType())
          case TimestampNTZType =>
            Types.optional(PrimitiveTypeName.INT64)
              .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS))
          case TimestampType =>
            Types.optional(PrimitiveTypeName.INT64)
              .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS))
          case other =>
            fail(s"writeBss has no parquet mapping for ${f.name}: $other — " +
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
      .withDictionaryEncoding(false) // dictionary pages would mask BSS
      .withByteStreamSplitEncoding(bss)
      .build()
    try {
      df.collect().foreach { row =>
        val g = factory.newGroup()
        fields.zipWithIndex.foreach { case (f, i) =>
          if (!row.isNullAt(i)) f.dataType match {
            case DoubleType  => g.add(f.name, row.getDouble(i))
            case LongType    => g.add(f.name, row.getLong(i))
            case IntegerType => g.add(f.name, row.getInt(i))
            case StringType  => g.add(f.name, row.getString(i))
            case TimestampNTZType =>
              val inst = row.getAs[java.time.LocalDateTime](i).toInstant(ZoneOffset.UTC)
              g.add(f.name, inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
            case TimestampType =>
              val ts = row.getAs[java.sql.Timestamp](i)
              g.add(f.name, ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L)
            case other => fail(s"unreachable: $other survived schema mapping")
          }
        }
        writer.write(g)
      }
    } finally writer.close()
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("bss tables really carry BYTE_STREAM_SPLIT pages") {
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new HadoopPath(s"$bssDir/lineitem.parquet"), conf))
    val encodings = try {
      import scala.jdk.CollectionConverters._
      reader.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        .filter(_.getPath.toDotString == "l_quantity")
        .flatMap(_.getEncodings.asScala).toSet
    } finally reader.close()
    assert(encodings.contains(Encoding.BYTE_STREAM_SPLIT),
      s"fixture degenerated: l_quantity encodings $encodings — BSS not applied")
  }

  test("Spark's vectorized reader still rejects BSS (the premise)") {
    // a raw read, NOT Engine.table — if a Spark upgrade adds
    // vectorized BSS support, this fails by name and the restage in
    // byteStreamSplitSafePath can retire
    val e = intercept[Exception] {
      spark.read.parquet(s"$bssDir/lineitem.parquet").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else String.valueOf(t.getMessage) + messages(t.getCause)
    assert(messages(e).contains("BYTE_STREAM_SPLIT"),
      s"raw BSS read failed for a different reason: ${messages(e)}")
  }

  test("Engine.table restages BSS tables value-identically") {
    recoded.foreach { t =>
      assert(rows(Engine.table(spark, bssDir, t)) ==
        rows(Engine.table(spark, canonical, t)),
        s"$t drifted under BYTE_STREAM_SPLIT pages")
    }
  }

  test("a MIXED plain+BSS multi-file dir is detected and restaged (all-leaf probe)") {
    // the encoding fact is per column chunk, not per table: a probe
    // that sampled only the first-listed leaf (the plain part-0 here)
    // would skip the restage and the scan would die at execution on
    // part-1's BSS pages
    assert(rows(Engine.table(spark, mixedDir, "lineitem")) ==
      rows(Engine.table(spark, canonical, "lineitem")),
      "lineitem drifted (or died) under a mixed plain+BSS multi-file dir")
  }

  test("invalidateFooterFacts drops stale facts after a same-JVM path rewrite") {
    // the footer-fact memo assumes a path's layout is immutable while
    // cached; Bench.resetSession clears it between harness queries so
    // a rewritten table (rehearsal replica rebuilt in place, reused
    // fixture dir) is re-probed — without the clear, the pre-rewrite
    // "no BSS" fact would skip the restage and the scan would die
    val dir = Files.createTempDirectory(root, "rewrite")
    val table = dir.resolve("lineitem.parquet")
    Files.copy(java.nio.file.Paths.get(s"$canonical/lineitem.parquet"), table)
    val want = rows(Engine.table(spark, dir.toString, "lineitem")) // caches plain facts
    Files.delete(table)
    writeBss(spark.read.parquet(s"$canonical/lineitem.parquet"), table.toString)
    Engine.invalidateFooterFacts()
    assert(rows(Engine.table(spark, dir.toString, "lineitem")) == want,
      "post-rewrite read served stale footer facts (or drifted) despite invalidation")
  }

  // q01 aggregates the BSS money doubles; q30 drives the streaming
  // event source (the same execution death, absorbed by the shared
  // safe-path helper) through real MicroBatchExecution
  Seq("q01_agg", "q30_stream_window_agg").foreach { q =>
    test(s"$q is value-identical under BYTE_STREAM_SPLIT pages") {
      val fn = SparkEntry.queries(q)
      val want = rows(fn(spark, canonical))
      assert(want.nonEmpty, s"$q returned no rows on canonical sf0.001 — pins nothing")
      assert(rows(fn(spark, bssDir)) == want,
        s"$q drifted under BYTE_STREAM_SPLIT pages")
    }
  }
}
