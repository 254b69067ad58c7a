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
  * replays. Feature extraction (q100) replays the stub's hash fold in
  * SQL: a recursive CTE carries the wrapping-long accumulator (HUGEINT
  * arithmetic reduced mod 2^64 back into signed range each step), and
  * per-lane REAL left-folds reproduce the float32 accumulation
  * bit-exactly — the q96/q98 deterministic-fixture pattern. Payloads
  * are clipped to printable ASCII so DuckDB codepoints equal Java's
  * signed bytes.
  */
object MediaOps {

  private val W = 64
  private val H = 32
  private val EveryNth = 2

  private def q59(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread: the resize/frame-sample kernels and md5 below run over a
    // single-file documents scan — one split = one core without it
    // (SCALE.md; q100 below spreads for the same reason)
    val docs = graft.Engine.spread(table(s, dir, "documents").where($"text".isNotNull))
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

  private val FDim = 4
  private val FLen = 48
  private val FSeed = 1125899906842597L

  /** q100: the REAL batched decode path ([[Multimodal.extractFeatures]]
    * — range-repartition, toRdd/mapPartitions, bounded batches) under
    * the driver gate, with the stub codec's arithmetic as the fixture.
    * Payloads are each document's text clipped to its first [[FLen]]
    * printable-ASCII chars so every byte is 0x20-0x7E: Java's signed
    * bytes then equal DuckDB's `ord`, and the oracle can replay the
    * seeded wrapping-long fold and float32 lane accumulation exactly. */
  private def q100(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread: the regex/clip/encode projection below would otherwise
    // run single-core below extractFeatures' range exchange (and twice
    // — the RangePartitioner sampling job evaluates it too)
    val docs = graft.Engine.spread(table(s, dir, "documents"))
      .where($"text".isNotNull)
    val clipped = substring(regexp_replace($"text", "[^ -~]", ""), 1, FLen)
    val media = docs.select(
      $"doc_id".as("media_id"), lit("image").as("kind"),
      encode(clipped, "UTF-8").as("bytes"),
      struct(
        lit(null).cast("string").as("source_path"),
        length(encode(clipped, "UTF-8")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("int").as("n_frames")).as("meta"))
    Multimodal.extractFeatures(media, Multimodal.StubCodec, FDim)
      .select($"media_id",
        element_at($"features", 1).cast("double").as("f0"),
        element_at($"features", 2).cast("double").as("f1"),
        element_at($"features", 3).cast("double").as("f2"),
        element_at($"features", 4).cast("double").as("f3"))
      .orderBy($"media_id")
  }

  /** Replays StubCodec.decodeFeatures: `acc = acc*31 + byte` on a
    * wrapping signed 64-bit accumulator (HUGEINT product reduced
    * mod 2^64 back into signed range — DuckDB `%` keeps the dividend's
    * sign, matching Java), contribution `(acc % 1000) / 1000.0f` as a
    * REAL division, accumulated per lane `i % dim` with an explicit
    * left fold of REAL adds (CAST each step keeps float32 — verified
    * bit-exact against the JVM). Empty payloads yield zero vectors via
    * the lanes LEFT JOIN. */
  private val q100Sql =
    s"""WITH RECURSIVE
        m AS (SELECT doc_id AS media_id,
                substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, $FLen) AS s
              FROM documents WHERE text IS NOT NULL),
        b AS (SELECT media_id, i, ord(substr(s, i::INT + 1, 1))::HUGEINT AS byte
              FROM (SELECT media_id, s, unnest(range(0, length(s))) AS i FROM m)),
        acc AS (
          SELECT media_id, -1::BIGINT AS i, ${FSeed}::HUGEINT AS a FROM m
          UNION ALL
          SELECT acc.media_id, acc.i + 1,
            ((acc.a * 31 + b.byte + 9223372036854775808) % 18446744073709551616
              + 18446744073709551616) % 18446744073709551616 - 9223372036854775808
          FROM acc JOIN b ON b.media_id = acc.media_id AND b.i = acc.i + 1),
        c AS (SELECT media_id, i, (i % $FDim)::INT AS lane,
                CAST(CAST(a % 1000 AS BIGINT) AS REAL) / CAST(1000 AS REAL) AS contrib
              FROM acc WHERE i >= 0),
        lanes AS (SELECT media_id, unnest(range(0, $FDim)) AS lane FROM m),
        f AS (SELECT lanes.media_id, lanes.lane,
                COALESCE(list_reduce(list_prepend(CAST(0 AS REAL),
                  list(contrib ORDER BY i) FILTER (contrib IS NOT NULL)),
                  (x,y) -> CAST(x+y AS REAL)), CAST(0 AS REAL)) AS v
              FROM lanes LEFT JOIN c ON c.media_id = lanes.media_id AND c.lane = lanes.lane
              GROUP BY 1, 2)
        SELECT media_id,
          CAST(max(CASE WHEN lane=0 THEN v END) AS DOUBLE) AS f0,
          CAST(max(CASE WHEN lane=1 THEN v END) AS DOUBLE) AS f1,
          CAST(max(CASE WHEN lane=2 THEN v END) AS DOUBLE) AS f2,
          CAST(max(CASE WHEN lane=3 THEN v END) AS DOUBLE) AS f3
        FROM f GROUP BY media_id ORDER BY media_id"""

  val all: Seq[Q] = Seq(
    Q("q59_multimodal_meta", q59 _, Some(q59Sql)),
    Q("q100_media_features", q100 _, Some(q100Sql)))
}
