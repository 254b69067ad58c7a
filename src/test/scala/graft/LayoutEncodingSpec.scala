package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** Physical-layout latitude for the driver-provided tables — the
  * file-shape analog of TableContractSpec (schemas),
  * EventSchemaContractSpec / TemporalEncodingSpec /
  * EmbeddingEncodingSpec / KeyWidthEncodingSpec (types). The driver
  * regenerates /root/testdata each round with whatever writer it
  * currently uses; two plausible drifts are PHYSICAL, not logical:
  *
  *  - a table arriving as a MULTI-FILE directory instead of today's
  *    single file. `Engine.spread` exists because one file often means
  *    one scan split (SCALE.md); multi-file inputs must flow through
  *    the spread-guarded pair joins and the CC scratch machinery
  *    (whose row counts come from per-file parquet footers) unchanged;
  *  - a table written with DIFFERENT PARQUET ENCODINGS: writer v2
  *    (DELTA_BINARY_PACKED ints, DELTA_BYTE_ARRAY strings) with
  *    dictionary encoding off — the layout a pyarrow option flip or
  *    version bump would ship. Arrow-level `large_string` lands as the
  *    same BYTE_ARRAY/UTF8 physical type, so this is the string-drift
  *    class with an actual on-disk difference;
  *  - (round 8) COLUMN ORDER permuted within each table — a select
  *    reorder or generator refactor driver-side; any positional read
  *    (getLong(0)-style row access, schema-index assumptions) breaks
  *    here while by-name access is untouched;
  *  - (round 8) a DIFFERENT COMPRESSION CODEC (zstd instead of
  *    snappy) — transparent to Spark's reader in principle, pinned so
  *    a codec flip can never be conflated with a real drift. (The
  *    remaining class from the round-7 brief, nested-struct field
  *    reordering, has no carrier: no driver table has a struct column
  *    — events.props is a JSON string.)
  *
  * Each variant rebuilds sf0.001 and pins one consumer query per
  * engine path VALUE-IDENTICAL to the canonical layout, so the next
  * regeneration fails here by name — never as a red driver gate.
  */
class LayoutEncodingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val canonical = "/root/testdata/sf0.001"

  /** One consumer per layout-sensitive path: plain scan+agg, star
    * join, events time bucketing, hash dedup, the spread-guarded LSH
    * band join, CC (footer-counted scratch rounds), embedding kernels,
    * and the staged whole-file HTML path. */
  private val consumers = Seq(
    "q01_agg",
    "q03_star_join",
    "q27_time_bucket_agg",
    "q16_exact_dedup",
    "q18_minhash_lsh_pairs",
    "q49_dedup_clusters",
    "q25_cosine_topk",
    "q60_html_extract")

  private var root: Path = _
  private var multiDir: String = _
  private var v2Dir: String = _
  private var reorderDir: String = _
  private var zstdDir: String = _

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("graft_layout_enc")
    multiDir = rebuild("multi") { (df, out) =>
      // 3 files per table: enough to make every single-split
      // assumption (spread, footer counts, per-file scans) visible
      df.repartition(3).write.mode("overwrite").parquet(out)
    }
    v2Dir = rebuild("v2") { (df, out) =>
      df.write
        .option("parquet.writer.version", "PARQUET_2_0")
        .option("parquet.enable.dictionary", "false")
        .mode("overwrite").parquet(out)
    }
    reorderDir = rebuild("reorder") { (df, out) =>
      df.select(df.columns.reverse.map(org.apache.spark.sql.functions.col): _*)
        .write.mode("overwrite").parquet(out)
    }
    zstdDir = rebuild("zstd") { (df, out) =>
      df.write.option("compression", "zstd").mode("overwrite").parquet(out)
    }
    super.beforeAll()
  }

  private def rebuild(name: String)(write: (DataFrame, String) => Unit): String = {
    val dir = root.resolve(name)
    Files.createDirectories(dir)
    Engine.tableNames.foreach { t =>
      write(spark.read.parquet(s"$canonical/$t.parquet"),
        dir.resolve(s"$t.parquet").toString)
    }
    dir.toString
  }

  override def afterAll(): Unit = {
    try super.afterAll()
    finally if (root != null)
      Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("multi-file tables really are multi-file") {
    val stream = Files.list(root.resolve("multi").resolve("documents.parquet"))
    val parts = try stream.filter(p => p.toString.endsWith(".parquet")).count()
    finally stream.close()
    assert(parts >= 2, s"fixture degenerated to $parts file(s) — layout not exercised")
  }

  test("v2 tables really carry v2/no-dictionary encodings") {
    // if the writer options ever stop propagating, the variant would
    // silently compare canonical data against an identical copy and
    // these 8 tests would pin nothing — assert the footer differs
    val stream = Files.list(root.resolve("v2").resolve("documents.parquet"))
    val file = try stream.filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    finally stream.close()
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toString), conf))
    val encodings = try {
      import scala.jdk.CollectionConverters._
      reader.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala).flatMap(_.getEncodings.asScala).toSet
    } finally reader.close()
    assert(!encodings.exists(_.toString.contains("DICTIONARY")) &&
      encodings.exists(_.toString.startsWith("DELTA")),
      s"fixture degenerated: encodings $encodings — v2/no-dictionary options not applied")
  }

  test("reordered tables really carry a permuted column order") {
    val want = spark.read.parquet(s"$canonical/documents.parquet").columns.toSeq
    val got = spark.read
      .parquet(root.resolve("reorder").resolve("documents.parquet").toString)
      .columns.toSeq
    assert(got == want.reverse && want.length >= 2,
      s"fixture degenerated: reorder variant has column order $got vs canonical $want")
  }

  test("zstd tables really are zstd-compressed") {
    val stream = Files.list(root.resolve("zstd").resolve("documents.parquet"))
    val file = try stream.filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    finally stream.close()
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toString), conf))
    val codecs = try {
      import scala.jdk.CollectionConverters._
      reader.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala).map(_.getCodec.toString).toSet
    } finally reader.close()
    assert(codecs == Set("ZSTD"),
      s"fixture degenerated: codecs $codecs — zstd option not applied")
  }

  consumers.foreach { q =>
    test(s"$q is value-identical under a multi-file table layout") {
      val fn = SparkEntry.queries(q)
      val want = rows(fn(spark, canonical))
      assert(want.nonEmpty, s"$q returned no rows on canonical sf0.001 — pins nothing")
      assert(rows(fn(spark, multiDir)) == want,
        s"$q drifted under the multi-file layout")
    }
    test(s"$q is value-identical under v2/no-dictionary parquet encodings") {
      val fn = SparkEntry.queries(q)
      assert(rows(fn(spark, v2Dir)) == rows(fn(spark, canonical)),
        s"$q drifted under parquet v2 / no-dictionary encodings")
    }
    test(s"$q is value-identical under a permuted column order") {
      val fn = SparkEntry.queries(q)
      assert(rows(fn(spark, reorderDir)) == rows(fn(spark, canonical)),
        s"$q drifted under a permuted table column order")
    }
    test(s"$q is value-identical under zstd-compressed parquet") {
      val fn = SparkEntry.queries(q)
      assert(rows(fn(spark, zstdDir)) == rows(fn(spark, canonical)),
        s"$q drifted under zstd-compressed parquet")
    }
  }
}
