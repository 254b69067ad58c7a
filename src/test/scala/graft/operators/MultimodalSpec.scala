package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class MultimodalSpec extends AnyFunSuite {

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", Array.tabulate(3000)(i => (i % 251).toByte),
        Row("mem://a.png", 3000L, null, null, null, null)),
      Row(2L, "image", Array.tabulate(50)(i => (i * 7 % 251).toByte),
        Row("mem://b.png", 50L, null, null, null, null)),
      Row(3L, "audio", Array.emptyByteArray,
        Row("mem://c.wav", 0L, null, null, null, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("feature extraction yields fixed-dim deterministic vectors") {
    val f1 = Multimodal.extractFeatures(mediaDf, Multimodal.StubCodec, dim = 8)
      .orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(mediaDf, Multimodal.StubCodec, dim = 8,
      numPartitions = 3, batchSize = 2)
      .orderBy("media_id").collect()
    assert(f1.length == 3)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      // partitioning/batching must not change results
      assert(a.getSeq[Float](2) == b.getSeq[Float](2))
    }
    assert(f1.forall(_.getSeq[Float](2).length == 8))
    // content-sensitive: different payloads -> different vectors
    assert(f1(0).getSeq[Float](2) != f1(1).getSeq[Float](2))
    // empty payload -> zero vector, not a crash
    assert(f1(2).getSeq[Float](2).forall(_ == 0.0f))
  }

  test("frame sampling keeps every nth frame with stable indices") {
    val frames = Multimodal.sampleFrames(mediaDf, Multimodal.StubCodec, everyNth = 2)
      .orderBy("media_id", "frame_idx").collect()
    // media 1: 3000 bytes -> 3 frames of 1024 -> keep idx 0,2 -> 2 rows
    // media 2: 50 bytes -> 1 frame -> keep 1; media 3: empty -> 0
    assert(frames.map(_.getLong(0)).toSeq == Seq(1L, 1L, 2L))
    assert(frames(0).getAs[Array[Byte]]("frame").length == 1024)
  }

  test("batched extraction is row-correct when a partition holds many rows (no UnsafeRow aliasing)") {
    import org.apache.spark.sql.Row
    val rows = (0L until 50L).map(i =>
      Row(i, "image", Array.tabulate(64)(j => ((i * 13 + j) % 251).toByte),
        Row(s"mem://$i.png", 64L, null, null, null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.mediaSchema)
    val out = Multimodal.extractFeatures(df, Multimodal.StubCodec, dim = 4,
      numPartitions = 1, batchSize = 8)
      .select("media_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == (0L until 50L),
      s"ids must be distinct and complete, got ${out.distinct.length} distinct")
  }

  test("resize keeps the media schema and updates geometry metadata") {
    val out = Multimodal.resizeMedia(mediaDf, Multimodal.StubCodec, w = 10, h = 4)
      .orderBy("media_id").collect()
    assert(out.length == 3)
    val r1 = out(0)
    assert(r1.getAs[Array[Byte]]("bytes").length == 40, "stub resize caps at w*h")
    val meta = r1.getAs[Row]("meta")
    assert(meta.getAs[Long]("n_bytes") == 40L &&
      meta.getAs[Int]("width") == 10 && meta.getAs[Int]("height") == 4)
    // empty payload stays empty, schema intact
    assert(out(2).getAs[Array[Byte]]("bytes").isEmpty)
  }

  test("binaryFile ingestion produces the canonical media schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-media")
    java.nio.file.Files.write(tmp.resolve("x.bin"), Array[Byte](1, 2, 3))
    val df = Multimodal.readBinaryDir(spark, tmp.toString, "image")
    val row = df.collect().head
    assert(df.schema.fieldNames.toSeq == Seq("media_id", "kind", "bytes", "meta"))
    assert(row.getAs[Array[Byte]]("bytes").toSeq == Seq[Byte](1, 2, 3))
    assert(row.getAs[Row]("meta").getAs[Long]("n_bytes") == 3L)
  }
}
