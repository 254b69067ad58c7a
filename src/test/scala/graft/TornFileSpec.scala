package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** TORN/corrupt parquet — the read-boundary failure family beyond the
  * type/encoding/codec drifts: a truncated file, an overwritten tail,
  * or a partial copy whose footer survived but whose pages did not.
  * None of these can EVER be read, so the only design question is HOW
  * they fail. Without a gate, Spark plans the scan from whatever
  * footer it can find and dies per split at EXECUTION as opaque
  * FAILED_READ_FILE — one unattributed red per query across the whole
  * gate (the brotli-class failure shape the codec gate closed).
  *
  * `Engine.byteStreamSplitSafePath`'s leaf probe — already on every
  * driver-table read path, batch and streaming — now validates each
  * leaf's framing (head magic, tail magic, footer length) and bounds
  * the footer's column-chunk claims against the actual data region,
  * and fails BY NAME pre-scan via [[TornFileException]]: the leaf
  * file, the defect, the remediation. `scripts/drift_rehearsal.py
  * torn` rehearses the same shapes over the full gate (its DESIGNED
  * outcome is named failures on every table-reading query, zero
  * opaque scan deaths — the brotli convention).
  */
class TornFileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val srcDir = Paths.get("/root/testdata/sf0.001")
  private var root: Path = _

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("graft_torn")
  }

  override def afterAll(): Unit = {
    val stream = Files.walk(root)
    try stream.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
    finally stream.close()
  }

  /** Fresh single-table dir holding `table`.parquet with `mutate`
    * applied to the canonical bytes. Fresh path per case: the footer
    * facts are memoized per path, and the gate must fire on FIRST read. */
  private def tornDir(caseName: String, table: String,
      mutate: Array[Byte] => Array[Byte]): String = {
    val dir = root.resolve(caseName)
    Files.createDirectories(dir)
    val bytes = Files.readAllBytes(srcDir.resolve(s"$table.parquet"))
    Files.write(dir.resolve(s"$table.parquet"), mutate(bytes))
    dir.toString
  }

  private def interceptTorn(body: => Any): TornFileException =
    intercept[TornFileException](body)

  test("a truncated file fails by name pre-scan (footer magic gone)") {
    val dir = tornDir("truncated", "region", b => b.take((b.length * 6) / 10))
    val e = interceptTorn(Engine.table(spark, dir, "region").collect())
    assert(e.getMessage.contains("region.parquet"), e.getMessage)
    assert(e.getMessage.contains("footer magic is not PAR1"), e.getMessage)
    assert(e.getMessage.contains("quarantine"), e.getMessage)
  }

  test("a sub-12-byte stub fails by name (truncated below minimum)") {
    val dir = tornDir("stub", "region", _.take(4))
    val e = interceptTorn(Engine.table(spark, dir, "region").collect())
    assert(e.getMessage.contains("below the 12-byte parquet minimum"), e.getMessage)
  }

  test("an overwritten tail fails by name (corrupt footer magic)") {
    val dir = tornDir("badmagic", "nation",
      b => b.dropRight(4) ++ "XXXX".getBytes("US-ASCII"))
    val e = interceptTorn(Engine.table(spark, dir, "nation").collect())
    assert(e.getMessage.contains("nation.parquet"), e.getMessage)
    assert(e.getMessage.contains("footer magic is not PAR1"), e.getMessage)
  }

  test("an overwritten head fails by name (bad header magic)") {
    val dir = tornDir("badhead", "nation",
      b => "XXXX".getBytes("US-ASCII") ++ b.drop(4))
    val e = interceptTorn(Engine.table(spark, dir, "nation").collect())
    assert(e.getMessage.contains("header magic is not PAR1"), e.getMessage)
  }

  test("a footer-length overrun fails by name (torn or corrupt footer)") {
    // plant a footer length far past the file size in the tail's
    // 4-byte little-endian length field
    val dir = tornDir("badlen", "nation", { b =>
      val out = b.clone()
      val bb = java.nio.ByteBuffer.wrap(out, out.length - 8, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(Int.MaxValue)
      out
    })
    val e = interceptTorn(Engine.table(spark, dir, "nation").collect())
    assert(e.getMessage.contains("overruns"), e.getMessage)
  }

  test("a torn mid-file (footer intact, pages missing) fails by name pre-scan") {
    // cut 4 KB out of the data region and keep the tail: the footer
    // parses fine but its column chunks now claim bytes past the
    // shrunken data region — the partial-copy shape. Without the
    // bounds check this dies mid-execution as FAILED_READ_FILE.
    val dir = tornDir("midfile", "lineitem", { b =>
      val cut = 4096
      val at = b.length / 3
      b.take(at) ++ b.drop(at + cut)
    })
    val e = interceptTorn(Engine.table(spark, dir, "lineitem").collect())
    assert(e.getMessage.contains("lineitem.parquet"), e.getMessage)
    assert(e.getMessage.contains("torn mid-file"), e.getMessage)
  }

  test("a multi-file dir names the one torn leaf; a healthy dir still reads") {
    // directory-shaped table (the LayoutEncodingSpec multi-file class):
    // one good part + one truncated part — the error must name the
    // damaged LEAF, not the table or a random split
    val table = root.resolve("multifile").resolve("region.parquet")
    Files.createDirectories(table)
    val bytes = Files.readAllBytes(srcDir.resolve("region.parquet"))
    Files.write(table.resolve("part-0.parquet"), bytes)
    Files.write(table.resolve("part-1.parquet"), bytes.take((bytes.length * 6) / 10))
    val e = interceptTorn(
      Engine.table(spark, root.resolve("multifile").toString, "region").collect())
    assert(e.getMessage.contains("part-1.parquet"), e.getMessage)

    val healthy = root.resolve("healthy").resolve("region.parquet")
    Files.createDirectories(healthy)
    Files.write(healthy.resolve("part-0.parquet"), bytes)
    Files.write(healthy.resolve("part-1.parquet"), bytes)
    val n = Engine.table(spark, root.resolve("healthy").toString, "region").count()
    assert(n == 2 * spark.read.parquet(srcDir.resolve("region.parquet").toString).count())
  }

  test("the streaming leg fails by the same name pre-stream") {
    // eventStream routes through the same gate (byteStreamSplitSafePath)
    // — a torn events table must die at stream CONSTRUCTION with the
    // named defect, not stream zero rows or die per micro-batch
    val dir = tornDir("streaming", "events", b => b.take((b.length * 6) / 10))
    val e = interceptTorn(
      graft.streaming.StreamingIngest.windowedEventCounts(spark, dir))
    assert(e.getMessage.contains("events.parquet"), e.getMessage)
    assert(e.getMessage.contains("footer magic is not PAR1"), e.getMessage)
  }

  test("canonical tables pass the framing gate untouched (no false positives)") {
    // the gate sits on EVERY driver read — a single false positive
    // would redden the whole suite; read each canonical sf0.001 table
    Engine.tableNames.foreach { t =>
      assert(Engine.table(spark, srcDir.toString, t).count() > 0, t)
    }
  }
}
