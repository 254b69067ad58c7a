package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** Encoding-latitude contract for the ORDER/LINEITEM temporal columns
  * (`o_orderdate`, `l_shipdate`) — the date-column analog of
  * EventSchemaContractSpec. The driver regenerates /root/testdata
  * between rounds and has already drifted a temporal encoding once
  * (events.ts int64-ns → TIMESTAMP micros, round 4: nine queries died
  * at analysis). TableContractSpec accepts DATE, TIMESTAMP and
  * TIMESTAMP_NTZ for these columns; this suite proves every consuming
  * query actually RUNS under each accepted encoding and returns
  * bit-identical rows — so the next drift is a no-op, not a red round.
  *
  * Value-preservation precondition: the shipped timestamps are
  * midnight-only (checked in its own test below), so a DATE cast loses
  * nothing and all three encodings must agree exactly.
  */
class TemporalEncodingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val canonical = "/root/testdata/sf0.001"

  /** Every SparkEntry query that reads o_orderdate or l_shipdate. */
  private val consumers = Seq(
    "q02_filter_project",  // l_shipdate filter + to_date projection
    "q08_window_running",  // window ORDER BY o_orderdate
    "q14_date_funcs",      // year/month/day/date_trunc/datediff
    "q37_rollup",
    "q40_pivot",
    "q71_bloom_join",      // month bucket on the probe side
    "q73_scd2_history",
    "q92_scd2_merge",
    "q94_asof_dimension")

  private val recoded = Map("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")

  private var root: Path = _

  /** Build one sf-dir per encoding: orders/lineitem rewritten with the
    * temporal column cast, every other table byte-copied. Variant
    * tables land as DIRECTORIES named `<table>.parquet` — Engine.table
    * reads files and directories alike. */
  private def buildVariant(encoding: String): String = {
    val dir = root.resolve(encoding)
    Files.createDirectories(dir)
    Engine.tableNames.foreach { t =>
      val src = s"$canonical/$t.parquet"
      recoded.get(t) match {
        case Some(c) =>
          spark.read.parquet(src)
            .withColumn(c, col(c).cast(encoding))
            .write.mode("overwrite").parquet(dir.resolve(s"$t.parquet").toString)
        case None =>
          Files.copy(Paths.get(src), dir.resolve(s"$t.parquet"),
            StandardCopyOption.REPLACE_EXISTING)
      }
    }
    dir.toString
  }

  private lazy val dateDir = buildVariant("date")
  private lazy val ntzDir = buildVariant("timestamp_ntz")

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("graft_temporal_enc")
    super.beforeAll()
  }

  override def afterAll(): Unit = {
    try super.afterAll()
    finally if (root != null)
      Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("shipped temporal values are midnight-only (DATE cast is lossless)") {
    recoded.foreach { case (t, c) =>
      val offMidnight = spark.read.parquet(s"$canonical/$t.parquet")
        .where(col(c).cast("timestamp") =!= col(c).cast("date").cast("timestamp"))
        .count()
      assert(offMidnight == 0L,
        s"$t.$c carries time-of-day; a DATE recode is no longer value-preserving " +
          "and this suite's exact-equality contract needs rethinking")
    }
  }

  consumers.foreach { q =>
    test(s"$q is encoding-invariant across timestamp/date/timestamp_ntz") {
      val fn = SparkEntry.queries(q)
      val want = rows(fn(spark, canonical))
      assert(want.nonEmpty, s"$q returned no rows on the canonical data — " +
        "an empty-vs-empty comparison would pin nothing")
      assert(rows(fn(spark, dateDir)) == want, s"$q drifted under DATE encoding")
      assert(rows(fn(spark, ntzDir)) == want, s"$q drifted under TIMESTAMP_NTZ encoding")
    }
  }
}
