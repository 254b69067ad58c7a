package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.operators.Multimodal

/** Driver-oracle coverage for the multimodal plumbing — previously
  * spec-only. The payloads are deterministic (each document's UTF-8
  * bytes stand in for an image payload), so the REAL per-partition
  * batched transforms ([[Multimodal.resizeMedia]],
  * [[Multimodal.sampleFrames]] — the toRdd/mapPartitions machinery a
  * production codec plugs into) run under the driver gate; only the
  * codec arithmetic is the documented stub (resize = byte cap at w*h,
  * frames = 1024-byte chunks every Nth), which is exactly what DuckDB
  * replays. Feature extraction (a hash fold not expressible in SQL)
  * stays spec-gated in MultimodalSpec.
  */
object MediaOps {

  private val W = 64
  private val H = 32
  private val EveryNth = 2

  private def q59(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = table(s, dir, "documents").where($"text".isNotNull)
    val media = docs.select(
      $"doc_id".as("media_id"), lit("image").as("kind"),
      encode($"text", "UTF-8").as("bytes"),
      struct(
        lit(null).cast("string").as("source_path"),
        length(encode($"text", "UTF-8")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("int").as("n_frames")).as("meta"))
    val resized = Multimodal.resizeMedia(media, Multimodal.StubCodec, W, H)
      .select($"media_id", $"meta.n_bytes".as("resized_bytes"))
    val frames = Multimodal.sampleFrames(media, Multimodal.StubCodec, EveryNth)
      .groupBy($"media_id").agg(count(lit(1)).as("n_frames_kept"))
    media.select($"media_id",
        length($"bytes").cast("long").as("orig_bytes"),
        md5($"bytes").as("payload_md5"))
      .join(resized, Seq("media_id"))
      .join(frames, Seq("media_id"), "left")
      .select($"media_id", $"orig_bytes", $"payload_md5",
        $"resized_bytes", coalesce($"n_frames_kept", lit(0L)).as("n_frames_kept"))
      .orderBy($"media_id")
  }

  private val q59Sql =
    s"""WITH m AS (SELECT doc_id AS media_id,
          octet_length(encode(text)) AS orig_bytes,
          md5(text) AS payload_md5
        FROM documents WHERE text IS NOT NULL)
        SELECT media_id, orig_bytes::BIGINT AS orig_bytes, payload_md5,
          least(orig_bytes, ${W * H})::BIGINT AS resized_bytes,
          (CASE WHEN orig_bytes = 0 THEN 0
                ELSE ((ceil(orig_bytes / 1024.0)::BIGINT - 1) // $EveryNth) + 1
           END)::BIGINT AS n_frames_kept
        FROM m ORDER BY media_id"""

  val all: Seq[Q] = Seq(
    Q("q59_multimodal_meta", q59 _, Some(q59Sql)))
}
