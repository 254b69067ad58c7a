package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** UNDECODABLE compression codec — the codec drift class beyond the
  * transparent snappy/zstd/lz4 pins. parquet's BROTLI (and LZO) map to
  * OPTIONAL hadoop codec classes this deployment does not carry, so
  * BOTH Spark readers die per column chunk at execution with
  * ClassNotFoundException — unlike BYTE_STREAM_SPLIT there is no
  * reader to restage through (the non-vectorized path needs the same
  * class). Without a guard, a pyarrow `compression='brotli'` export
  * kills the whole gate as one opaque FAILED_READ_FILE per query (the
  * exact shape the round-11 `bss` rehearsal hit live on 27 queries).
  *
  * `Engine.byteStreamSplitSafePath` — the shared batch + streaming
  * read gate — probes the footer codec set ([[Engine]] leafFacts) and
  * fails BY NAME: table, codec, and the missing hadoop codec class,
  * before any scan is planned. The check is DYNAMIC (Class.forName via
  * the hadoop conf), so adding a brotli-codec jar to a deployment
  * makes the same table just read — nothing here hardcodes "brotli is
  * bad".
  *
  * The fixture is a pyarrow-written brotli parquet committed at
  * src/test/resources/codec/events_brotli.parquet (regenerate with
  * scripts/gen_codec_fixture.py): the JVM under test can neither
  * write nor read brotli, which is precisely the premise.
  */
class CodecEncodingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var root: Path = _
  private var sfDir: String = _

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("graft_codec_enc")
    // events-SHAPED so both the batch and streaming guards see the
    // realistic driver-table name; the spec only ever asserts errors
    val fixture = Paths.get(getClass.getResource("/codec/events_brotli.parquet").toURI)
    Files.copy(fixture, root.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    sfDir = root.toString
  }

  override def afterAll(): Unit = {
    val stream = Files.walk(root)
    try stream.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
    finally stream.close()
  }

  private def messages(t: Throwable): String =
    if (t == null) "" else String.valueOf(t.getMessage) + " | " + messages(t.getCause)

  test("the classpath still lacks the brotli codec (the premise)") {
    // a raw read, NOT Engine.table — if a Spark upgrade (or a codec
    // jar landing on the classpath) makes brotli readable, this fails
    // by name and the guard should retire into a transparent pin like
    // the lz4 rehearsal
    val e = intercept[Exception] {
      spark.read.parquet(s"$sfDir/events.parquet").collect()
    }
    assert(messages(e).contains("BrotliCodec"),
      s"raw brotli read failed for a different reason (or succeeded a " +
        s"layer deeper): ${messages(e)} — if brotli is now decodable, retire " +
        "the fail-by-name guard and pin the codec as transparent instead")
  }

  test("Engine.table fails BY NAME on a brotli table (batch read gate)") {
    val e = intercept[IllegalStateException] {
      Engine.table(spark, sfDir, "events").collect()
    }
    val m = e.getMessage
    assert(m.contains("events") && m.contains("BROTLI")
        && m.contains("BrotliCodec") && m.contains("re-export"),
      s"guard message must name table, codec, missing class, and remediation: $m")
  }

  test("the streaming event source fails BY NAME too (shared gate)") {
    // eventStream routes through the same byteStreamSplitSafePath; the
    // guard fires at stream CONSTRUCTION, not per micro-batch
    val e = intercept[IllegalStateException] {
      graft.streaming.StreamingIngest.windowedEventCounts(spark, sfDir)
    }
    assert(e.getMessage.contains("BROTLI"),
      s"streaming guard message drifted: ${e.getMessage}")
  }

  test("canonical tables never trip the codec guard (snappy/zstd/gzip/lz4 pass)") {
    // the guard sits on EVERY driver-table read: a false positive on a
    // standard codec would kill the whole gate — pin the pass-through
    val df = Engine.table(spark, "/root/testdata/sf0.001", "events")
    assert(df.count() > 0)
  }
}
