package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{abs, col, max}
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** Integer-width latitude for every gate-consumed key column — the
  * id/measure-key analog of TemporalEncodingSpec (dates),
  * EventSchemaContractSpec (event time) and EmbeddingEncodingSpec
  * (vector elements). TableContractSpec accepts int-or-long for every
  * key; the driver regenerates /root/testdata each round and has
  * already drifted events.ts twice, date columns once and embedding
  * widths once, so the remaining plausible drift class is integer
  * width flips (pyarrow int32 vs int64 defaults).
  *
  * This suite rebuilds sf0.001 with EVERY int column flipped to long
  * and every long column flipped to int — all tables at once — and
  * asserts a consumer query per key family RETURNS IDENTICAL VALUES.
  * Width-agnosticism holds because keys are only compared, joined,
  * grouped and emitted, and the query edge casts emitted ints to
  * BIGINT by convention; a UDF or kernel typed narrower than the
  * parquet (the q98 Seq[Float] failure EmbeddingEncodingSpec caught)
  * would fail ANALYSIS here, one named spec ahead of a red gate.
  */
class KeyWidthEncodingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val canonical = "/root/testdata/sf0.001"

  /** One consumer per key family: TPC-H star joins (region/nation/
    * customer/supplier/part/orders/lineitem keys), anti/semi joins,
    * events side columns (event_id/user_id), documents doc_id through
    * the hash-dedup and LSH paths, and the window/top-k shapes. */
  private val consumers = Seq(
    "q01_agg",            // lineitem measure agg over flipped line keys
    "q02_filter_project", // part keys + pushdown
    "q03_star_join",      // customer/orders/nation/region key joins
    "q04_left_anti",      // orders vs customer anti join
    "q05_left_semi",      // semi join on flipped keys
    "q07_window_keep_best", // window partition keys
    "q09_topk",           // order keys through TakeOrderedAndProject
    "q16_exact_dedup",    // documents.doc_id min-survivor
    "q18_minhash_lsh_pairs", // doc_id through banding + pair join
    "q27_time_bucket_agg",   // events event_id/user_id side columns
    "q28_sessionize",        // user_id session keys
    "q93_cohort_retention")  // user_id cohort joins

  /** q04 (customers with no orders) is empty at sf0.001 — every
    * customer ordered. Empty-vs-empty still pins the class that
    * matters (an encoding the anti-join cannot ANALYZE), so only the
    * non-empty guard is waived, not the equality. */
  private val mayBeEmpty = Set("q04_left_anti")

  private var root: Path = _
  private var flippedDir: String = _

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("graft_key_width_enc")
    val dir = root.resolve("flipped")
    Files.createDirectories(dir)
    Engine.tableNames.foreach { t =>
      val df = spark.read.parquet(s"$canonical/$t.parquet")
      flip(df).write.mode("overwrite")
        .parquet(dir.resolve(s"$t.parquet").toString)
    }
    flippedDir = dir.toString
    super.beforeAll()
  }

  /** int -> long and long -> int on every top-level integer column
    * whose values fit in the target width. Key columns all fit in
    * int32 at sf0.001, so the narrowing flip is exact there; a long
    * column carrying values past Int.MaxValue (events.ts whenever the
    * driver regenerates it as int64-ns epochs, ~1.7e18) is NOT a key
    * and must not be narrowed — under ANSI the cast would throw in
    * beforeAll and turn a tolerated ts-encoding drift into a red spec
    * about key widths. The width probe is one agg per table. */
  private def flip(df: DataFrame): DataFrame = {
    val longCols =
      df.schema.fields.collect { case f if f.dataType == LongType => f.name }.toSeq
    val narrowable: Set[String] =
      if (longCols.isEmpty) Set.empty
      else {
        val maxes = df.select(longCols.map(c => max(abs(col(c))).as(c)): _*).head()
        longCols.zipWithIndex.collect {
          case (c, i) if maxes.isNullAt(i) || maxes.getLong(i) <= Int.MaxValue.toLong => c
        }.toSet
      }
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case IntegerType => d.withColumn(f.name, col(f.name).cast("long"))
        case LongType if narrowable(f.name) =>
          d.withColumn(f.name, col(f.name).cast("int"))
        case _ => d
      }
    }
  }

  override def afterAll(): Unit = {
    try super.afterAll()
    finally if (root != null)
      Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  consumers.foreach { q =>
    test(s"$q is value-identical under flipped integer key widths") {
      val fn = SparkEntry.queries(q)
      val want = rows(fn(spark, canonical))
      assert(mayBeEmpty(q) || want.nonEmpty,
        s"$q returned no rows on canonical sf0.001 — empty-vs-empty pins nothing")
      assert(rows(fn(spark, flippedDir)) == want,
        s"$q drifted under flipped integer key widths")
    }
  }
}
