package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads ride as opaque BINARY columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as BATCHED partition
  * functions.
  *
  * The Spark-side plumbing here is real and tested — schema, binaryFile
  * ingestion, deterministic batch shape, partition sizing — while the
  * actual media codecs are STUBBED behind [[MediaCodec]] (this
  * container ships no image/audio libraries). Swap in a real codec
  * implementation and nothing else changes.
  *
  * Scale notes: payload rows are orders of magnitude wider than
  * relational rows, so operators here (a) never shuffle payload bytes —
  * all transforms are per-partition map functions; (b) repartition by
  * range on the id BEFORE heavy decode so skewed file sizes spread
  * across executors; (c) emit fixed-size feature vectors, after which
  * the data re-enters the columnar fast path.
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source_path", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Pluggable codec boundary. Implementations MUST be deterministic
    * pure functions of the payload bytes. */
  trait MediaCodec extends Serializable {
    def decodeFeatures(kind: String, bytes: Array[Byte], dim: Int): Array[Float]
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    def sampleFrames(bytes: Array[Byte], everyNth: Int): Seq[Array[Byte]]
    /** Batch decode seam: real codecs override with vectorized / GPU /
      * JNI-amortized decode; the default just maps the scalar form, so
      * [[extractFeatures]]' batching costs nothing when no batch
      * implementation exists. Must return one vector per input, in
      * order. */
    def decodeFeaturesBatch(items: Seq[(String, Array[Byte])],
        dim: Int): Seq[Array[Float]] =
      items.map { case (kind, bytes) => decodeFeatures(kind, bytes, dim) }
  }

  /** STUB codec — a deterministic fake standing in for real image/audio
    * decoding (no media libraries in this environment). Features are a
    * seeded hash fold of the payload so tests get stable, content-
    * sensitive vectors; resize/frame ops slice bytes deterministically. */
  object StubCodec extends MediaCodec {
    override def decodeFeatures(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var acc = 1125899906842597L // seed
      var i = 0
      while (i < bytes.length) {
        acc = acc * 31 + bytes(i)
        out(i % dim) += (acc % 1000L) / 1000.0f
        i += 1
      }
      out
    }
    override def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(bytes, math.min(bytes.length, w * h))
    override def sampleFrames(bytes: Array[Byte], everyNth: Int): Seq[Array[Byte]] =
      bytes.grouped(1024).zipWithIndex.collect {
        case (frame, i) if i % everyNth == 0 => frame
      }.toSeq
  }

  /** Ingest a directory of files as a media table (Spark's binaryFile
    * source: content + length + path, no decode at scan time). */
  def readBinaryDir(spark: SparkSession, path: String, kind: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(
        xxhash64(col("path")).as("media_id"),
        lit(kind).as("kind"),
        col("content").as("bytes"),
        struct(
          col("path").as("source_path"),
          col("length").as("n_bytes"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("int").as("sample_rate"),
          lit(null).cast("int").as("n_frames")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("features", ArrayType(FloatType))))

  /** Batched feature extraction: range-partition on id (spread skewed
    * payload sizes), then decode per-partition in fixed-size batches —
    * the JVM analogue of mapInPandas with a bounded batch. The batch
    * buffers AT MOST batchSize payloads per task (that is its memory
    * cost, not a saving — a scalar loop would hold one) in exchange for
    * the [[MediaCodec.decodeFeaturesBatch]] vectorization seam: real
    * codecs amortize model/library init or offload whole batches. */
  def extractFeatures(media: DataFrame, codec: MediaCodec, dim: Int,
      numPartitions: Int = 0, batchSize: Int = 64): DataFrame = {
    // driver-side guard (sampleFrames' everyNth precedent): grouped(0)
    // would otherwise throw an opaque error inside executor tasks
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = media.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val balanced = media.select("media_id", "kind", "bytes")
      .repartitionByRange(parts, col("media_id"))
    val rows = balanced.queryExecution.toRdd.mapPartitions { iter =>
      // Fields are extracted BEFORE grouped(): the scan iterator reuses
      // one UnsafeRow buffer, so buffering row REFERENCES across a
      // batch would alias every row to the batch's last. The extracted
      // scalars (and getBinary's fresh array) are safe to buffer.
      iter.map { ir =>
        val id = ir.getLong(0)
        val kind = if (ir.isNullAt(1)) null else ir.getUTF8String(1).toString
        val bytes = if (ir.isNullAt(2)) Array.emptyByteArray else ir.getBinary(2)
        (id, kind, bytes)
      }.grouped(batchSize).flatMap { batch =>
        val feats = codec.decodeFeaturesBatch(
          batch.map { case (_, kind, bytes) => (kind, bytes) }, dim).toIndexedSeq
        // one-vector-per-input is the codec CONTRACT (scaladoc above);
        // zip would silently truncate to the shorter side — a
        // third-party codec that skips a failed decode would vanish
        // the last rows of every batch with no error
        require(feats.size == batch.size,
          s"codec returned ${feats.size} feature vectors for ${batch.size} inputs")
        batch.iterator.zip(feats.iterator).map {
          case ((id, kind, _), f) => Row(id, kind, f)
        }
      }
    }
    spark.createDataFrame(rows, featureSchema)
  }

  /** Batched resize: payload-in, payload-out per-partition map (no
    * shuffle of bytes); output keeps the media schema with width/height
    * metadata updated so downstream stages see the new geometry. */
  def resizeMedia(media: DataFrame, codec: MediaCodec, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select(col("media_id"), col("kind"), col("bytes"),
        col("meta.source_path"), col("meta.sample_rate"), col("meta.n_frames"))
      .queryExecution.toRdd.mapPartitions { iter =>
      iter.map { ir =>
        val id = ir.getLong(0)
        val kind = if (ir.isNullAt(1)) null else ir.getUTF8String(1).toString
        val bytes = if (ir.isNullAt(2)) Array.emptyByteArray else ir.getBinary(2)
        val path = if (ir.isNullAt(3)) null else ir.getUTF8String(3).toString
        // audio/video metadata passes through untouched — only the
        // geometry and byte count change under a resize
        val sampleRate: Any = if (ir.isNullAt(4)) null else ir.getInt(4)
        val nFrames: Any = if (ir.isNullAt(5)) null else ir.getInt(5)
        val resized = codec.resize(bytes, w, h)
        Row(id, kind, resized,
          Row(path, resized.length.toLong, w, h, sampleRate, nFrames))
      }
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** Deterministic frame sampling: one output row per kept frame,
    * exploded per-partition (no payload shuffle). */
  def sampleFrames(media: DataFrame, codec: MediaCodec, everyNth: Int): DataFrame = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth " +
      "(0 divides by zero inside executor tasks; negatives keep only frame 0)")
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val rows = media.select("media_id", "bytes").queryExecution.toRdd.mapPartitions { iter =>
      iter.flatMap { ir =>
        val id = ir.getLong(0)
        val bytes = if (ir.isNullAt(1)) Array.emptyByteArray else ir.getBinary(1)
        codec.sampleFrames(bytes, everyNth).zipWithIndex.map {
          case (frame, i) => Row(id, i, frame)
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
