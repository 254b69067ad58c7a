package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.operators.SimilaritySearch

/** Similarity-search surface over the `embeddings` table: brute-force
  * cosine top-k (baseline) and IVF-style bucketed top-k (scale path).
  * Both engines compute the dot product as an identical left-to-right
  * DOUBLE fold, so rounded similarities hash-match exactly.
  */
object VectorOps {

  private val QueryIds: Seq[Long] = 0L until 10L
  private def queryIdList = QueryIds.mkString("(", ", ", ")")

  /** SQL fragment: left-fold dot product of DOUBLE[] exprs a . b. */
  private def sqlDot(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  /** Brute-force exact cosine top-5 for 10 query vectors. */
  private def q25(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.bruteForceTopK(
      table(s, dir, "embeddings"), "vec_id", "embedding", QueryIds, 5)
      .select("query_id", "cand_id", "cos_sim", "rank")
      .orderBy("query_id", "rank")

  private val q25Sql =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id IN $queryIdList),
        sc AS (SELECT query_id, c.vec_id AS cand_id,
                 round(CASE WHEN sqrt(${sqlDot("qv", "qv")}) * sqrt(${sqlDot("c.v", "c.v")}) = 0
                            THEN 0.0
                            ELSE ${sqlDot("qv", "c.v")} /
                                 (sqrt(${sqlDot("qv", "qv")}) * sqrt(${sqlDot("c.v", "c.v")})) END, 6)
                   AS cos_sim
               FROM q CROSS JOIN e c WHERE c.vec_id <> query_id)
        SELECT query_id, cand_id, cos_sim, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rank
          FROM sc) x
        WHERE rank <= 5 ORDER BY query_id, rank"""

  /** IVF-style bucketed cosine top-3 (search only the query's cluster). */
  private def q26(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.bucketedTopK(
      table(s, dir, "embeddings"), "vec_id", "embedding", "label", QueryIds, 3)
      .select("query_id", "bucket", "cand_id", "cos_sim", "rank")
      .orderBy("query_id", "rank")

  private val q26Sql =
    s"""WITH e AS (SELECT vec_id, label::BIGINT AS bucket, embedding::DOUBLE[] AS v
                   FROM embeddings),
        q AS (SELECT vec_id AS query_id, bucket AS q_bucket, v AS qv FROM e
              WHERE vec_id IN $queryIdList),
        sc AS (SELECT query_id, c.bucket AS bucket, c.vec_id AS cand_id,
                 round(CASE WHEN sqrt(${sqlDot("qv", "qv")}) * sqrt(${sqlDot("c.v", "c.v")}) = 0
                            THEN 0.0
                            ELSE ${sqlDot("qv", "c.v")} /
                                 (sqrt(${sqlDot("qv", "qv")}) * sqrt(${sqlDot("c.v", "c.v")})) END, 6)
                   AS cos_sim
               FROM q JOIN e c ON c.bucket = q.q_bucket
               WHERE c.vec_id <> query_id)
        SELECT query_id, bucket, cand_id, cos_sim, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rank
          FROM sc) x
        WHERE rank <= 3 ORDER BY query_id, rank"""

  /** Embedding-cosine near-duplicate pairs: same-bucket self-join,
    * cosine >= threshold — the vector-space analogue of MinHash dedup
    * (one shuffle on the coarse bucket; no global n^2). */
  private def q35(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = table(s, dir, "embeddings").select(
      $"vec_id", $"label".cast("long").as("bucket"), $"embedding",
      SimilaritySearch.l2Norm($"embedding").as("nrm"))
    // Engine.spread: same-bucket pair join — quadratic per bucket, so
    // the probe side must not inherit a single-split scan's parallelism
    val a = graft.Engine.spread(e.select($"vec_id".as("id_a"), $"bucket",
      $"embedding".as("va"), $"nrm".as("na")))
    val b = e.select($"vec_id".as("id_b"), $"bucket".as("bucketb"),
      $"embedding".as("vb"), $"nrm".as("nb"))
    a.join(b, $"bucket" === $"bucketb" && $"id_a" < $"id_b")
      .withColumn("cos_sim",
        round(when($"na" * $"nb" === 0.0, 0.0)
          .otherwise(SimilaritySearch.dot($"va", $"vb") / ($"na" * $"nb")), 6))
      .where($"cos_sim" >= 0.95)
      .select($"bucket", $"id_a", $"id_b", $"cos_sim")
      .orderBy($"id_a", $"id_b")
  }

  private val q35Sql =
    s"""WITH e AS (SELECT vec_id, label::BIGINT AS bucket, embedding::DOUBLE[] AS v
                   FROM embeddings)
        SELECT bucket, id_a, id_b, cos_sim FROM (
          SELECT a.bucket AS bucket, a.vec_id AS id_a, b.vec_id AS id_b,
            round(CASE WHEN sqrt(${sqlDot("a.v", "a.v")}) * sqrt(${sqlDot("b.v", "b.v")}) = 0
                       THEN 0.0
                       ELSE ${sqlDot("a.v", "b.v")} /
                            (sqrt(${sqlDot("a.v", "a.v")}) * sqrt(${sqlDot("b.v", "b.v")})) END, 6)
              AS cos_sim
          FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) x
        WHERE cos_sim >= 0.95 ORDER BY id_a, id_b"""

  /** SQL fragment: dot product of BIGINT[] codes — the same fold as
    * [[sqlDot]] (the "integer" distinction lives entirely in DuckDB's
    * type inference over the operands, so a second definition would
    * only be a copy that can drift). */
  private def sqlIntDot(a: String, b: String): String = sqlDot(a, b)

  /** Int8-quantized cosine top-5: per-vector symmetric scalar
    * quantization (scale = max|v|/127, code = floor(v/scale + 0.5)),
    * then top-k over the INTEGER dot — the scales cancel in cosine, so
    * search never dequantizes. The oracle replays the quantization
    * arithmetic itself, so the driver verifies the codec, not just the
    * ranking. */
  private def q63(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.quantizedTopK(
      SimilaritySearch.quantizeInt8(table(s, dir, "embeddings"), "vec_id", "embedding"),
      QueryIds, 5)
      .select("query_id", "cand_id", "qcos_sim", "rank")
      .orderBy("query_id", "rank")

  private val q63Sql =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        s AS (SELECT vec_id, v,
                list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
        c AS (SELECT vec_id,
                CASE WHEN scale = 0
                     THEN list_transform(v, x -> 0::BIGINT)
                     ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
                END AS codes FROM s),
        n AS (SELECT vec_id, codes,
                sqrt((${sqlIntDot("codes", "codes")})::DOUBLE) AS nrm FROM c),
        q AS (SELECT vec_id AS query_id, codes AS qc, nrm AS qn FROM n
              WHERE vec_id IN $queryIdList),
        sc AS (SELECT query_id, c2.vec_id AS cand_id,
                 round(CASE WHEN qn * c2.nrm = 0 THEN 0.0
                            ELSE (${sqlIntDot("qc", "c2.codes")})::DOUBLE
                                 / (qn * c2.nrm) END, 6) AS qcos_sim
               FROM q CROSS JOIN n c2 WHERE c2.vec_id <> query_id)
        SELECT query_id, cand_id, qcos_sim, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY qcos_sim DESC, cand_id) AS rank
          FROM sc) x
        WHERE rank <= 5 ORDER BY query_id, rank"""

  private val SemTau = 0.3

  /** SemDeDup summary: greedy cosine dedup within coarse clusters +
    * survivors' mean centroid similarity. The label column stands in
    * for the IVF coarse assignment so the oracle replays the whole
    * pipeline (drop set, centroids, scoring) deterministically. */
  private def q77(s: SparkSession, dir: String): DataFrame =
    graft.operators.SemDedup.summary(
        table(s, dir, "embeddings"), "vec_id", "label", "embedding", SemTau)
      .select(col("cl").cast("long").as("cl"), col("n"), col("n_dropped"),
        col("n_kept"), roundSafe(col("mean_cent_cos"), 6).as("mean_cent_cos"))
      .orderBy(col("cl"))

  private val q77Sql =
    s"""WITH e AS (SELECT vec_id, label::BIGINT AS cl, embedding::DOUBLE[] AS v
                   FROM embeddings),
        n AS (SELECT vec_id, cl, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM e),
        p AS (SELECT b.vec_id AS drop_id
              FROM n a JOIN n b ON a.cl = b.cl AND a.vec_id < b.vec_id
              WHERE round(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
                               ELSE ${sqlDot("a.v", "b.v")} / (a.nrm * b.nrm) END, 6)
                    >= $SemTau),
        k AS (SELECT n.* FROM n WHERE vec_id NOT IN (SELECT DISTINCT drop_id FROM p)),
        cd AS (SELECT cl, i, avg(x) AS m FROM (
                 SELECT cl, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM e)
               GROUP BY 1, 2),
        c2 AS (SELECT cl, list(m ORDER BY i) AS c FROM cd GROUP BY 1),
        cn AS (SELECT cl, c, sqrt(${sqlDot("c", "c")}) AS cnrm FROM c2),
        kc AS (SELECT k.cl, CASE WHEN k.nrm * cn.cnrm = 0 THEN 0.0
                                 ELSE ${sqlDot("k.v", "cn.c")} / (k.nrm * cn.cnrm)
                            END AS ccos
               FROM k JOIN cn ON k.cl IS NOT DISTINCT FROM cn.cl),
        t AS (SELECT cl, count(*)::BIGINT AS n FROM e GROUP BY 1),
        ka AS (SELECT cl, count(*)::BIGINT AS n_kept, avg(ccos) AS mc FROM kc GROUP BY 1)
        SELECT t.cl, t.n, (t.n - coalesce(ka.n_kept, 0))::BIGINT AS n_dropped,
          coalesce(ka.n_kept, 0)::BIGINT AS n_kept,
          round(ka.mc + 1e-9, 6) AS mean_cent_cos
        FROM t LEFT JOIN ka ON t.cl IS NOT DISTINCT FROM ka.cl
        ORDER BY t.cl NULLS FIRST"""

  // ---- q96: PQ/ADC search against a FIXTURE codebook ------------------
  //
  // The KMeans-trained PQ index stays spec-gated (AnnSpec recall);
  // q96 drives the SAME encode + ADC machinery with a deterministic
  // codebook so the driver oracle pins the arithmetic end-to-end:
  // encode = per-subspace argmin of a low-index-first squared-L2 fold
  // (strict <, lowest centroid wins ties), ADC = per-query [m][k]
  // distance table + m lookups summed low-subspace-first. Both engines
  // execute the identical left-to-right double folds, so rounded
  // distances (and the ranks derived from the raw ones) hash-match.

  private val PqM = 8 // subspaces over dim 64 -> dsub 8
  private val PqK = 8 // centroids per subspace

  /** Fixture codebook entry (s, c, i): small-integer lattice mapped
    * into the embedding data range [-0.2, 0.2]; the mixed-radix
    * product spreads centroids so argmins are well-separated. */
  private def fixtureCodebooks: Array[Array[Array[Double]]] =
    Array.tabulate(PqM, PqK, 8)((s, c, i) =>
      (((s + 1) * (c + 2) * (i + 3)) % 17 - 8) / 40.0)

  private def q96(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.pqSearch(
      SimilaritySearch.pqEncode(
        table(s, dir, "embeddings"), "vec_id", "embedding", fixtureCodebooks),
      table(s, dir, "embeddings"), "vec_id", "embedding", QueryIds, 5)
      .select(col("query_id"), col("cand_id"),
        roundSafe(col("approx_d2"), 6).as("approx_d2"), col("rank"))
      .orderBy("query_id", "rank")

  private val q96Sql = {
    val idx8 = "[0, 1, 2, 3, 4, 5, 6, 7]"
    val cbEntry = "((((s + 1) * (c + 2) * (i + 3)) % 17) - 8) / 40.0"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cent AS (SELECT s::INT AS s, c::INT AS c FROM range(8) t1(s), range(8) t2(c)),
        dist AS (SELECT vec_id, s, c,
            list_reduce(
              list_transform(
                list_transform($idx8, i -> v[s * 8 + i + 1] - ($cbEntry)),
                t -> t * t),
              (x, y) -> x + y) AS d
          FROM e CROSS JOIN cent),
        code AS (SELECT vec_id, s, c AS code FROM (
            SELECT vec_id, s, c,
              row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
            FROM dist) z
          WHERE rn = 1),
        cl AS (SELECT vec_id, list(code ORDER BY s) AS codes FROM code GROUP BY vec_id),
        qt AS (SELECT vec_id AS query_id, list(d ORDER BY s, c) AS t FROM dist
               WHERE vec_id IN $queryIdList GROUP BY vec_id),
        sc AS (SELECT query_id, cl.vec_id AS cand_id,
            list_reduce(list_transform($idx8, s -> t[s * 8 + codes[s + 1] + 1]),
              (x, y) -> x + y) AS d2
          FROM qt CROSS JOIN cl WHERE cl.vec_id <> query_id)
        SELECT query_id, cand_id, round(d2 + 1e-9, 6) AS approx_d2, rank::BIGINT AS rank
        FROM (SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY d2 ASC, cand_id) AS rank FROM sc) x
        WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  // ---- q98: IVF probe+search against FIXTURE centroids -----------------
  //
  // Same deterministic-fixture idea as q96, applied to the IVF path:
  // assign every vector to its nearest fixture centroid (argmin of a
  // low-index-first squared-L2 fold), probe the nProbe nearest lists
  // per query (rank by that same distance, centroid id tiebreak), then
  // exact rounded cosine inside the probed lists only. Pins
  // ivfAssign + ivfSearch end-to-end; the KMeans-trained quantizer
  // stays spec-gated (AnnSpec recall).

  private val IvfLists = 8
  private val IvfProbe = 2

  /** Fixture centroid (c, i): same small-integer lattice family as the
    * q96 codebooks, spanning the full 64-dim vector. */
  private def fixtureCentroids: Array[(Int, Array[Double])] =
    Array.tabulate(IvfLists)(c =>
      c -> Array.tabulate(64)(i => ((c + 2) * (i + 3) % 17 - 8) / 40.0))

  private def q98(s: SparkSession, dir: String): DataFrame = {
    val emb = table(s, dir, "embeddings")
    SimilaritySearch.ivfSearch(
      SimilaritySearch.ivfAssign(emb, "vec_id", "embedding", fixtureCentroids),
      emb.where(col("vec_id").isin(QueryIds: _*)), "vec_id", "embedding",
      k = 5, nProbe = IvfProbe)
      .select(col("query_id"), col("cand_id"), col("cos_sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  private val q98Sql = {
    val centEntry = "(((c + 2) * (i + 3)) % 17 - 8) / 40.0"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cent AS (SELECT c::INT AS c FROM range($IvfLists) t(c)),
        ad AS (SELECT vec_id, c,
            list_reduce(
              list_transform(
                list_transform(range(0, 64), i -> v[i + 1] - ($centEntry)),
                t -> t * t),
              (x, y) -> x + y) AS d
          FROM e CROSS JOIN cent),
        assign AS (SELECT vec_id, c AS bucket FROM (
            SELECT vec_id, c, row_number() OVER (
              PARTITION BY vec_id ORDER BY d, c) AS rn FROM ad) z
          WHERE rn = 1),
        probe AS (SELECT vec_id AS query_id, c AS bucket FROM (
            SELECT vec_id, c, row_number() OVER (
              PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM ad WHERE vec_id IN $queryIdList) z
          WHERE rn <= $IvfProbe),
        sc AS (SELECT p.query_id, ce.vec_id AS cand_id,
            round(CASE WHEN sqrt(${sqlDot("qe.v", "qe.v")}) * sqrt(${sqlDot("ce.v", "ce.v")}) = 0
                       THEN 0.0
                       ELSE ${sqlDot("qe.v", "ce.v")} /
                            (sqrt(${sqlDot("qe.v", "qe.v")}) * sqrt(${sqlDot("ce.v", "ce.v")})) END, 6)
              AS cos_sim
          FROM probe p
               JOIN e qe ON qe.vec_id = p.query_id
               JOIN assign a ON a.bucket = p.bucket
               JOIN e ce ON ce.vec_id = a.vec_id
          WHERE ce.vec_id <> p.query_id)
        SELECT query_id, cand_id, cos_sim, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rank
          FROM sc) x
        WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  val all: Seq[Q] = Seq(
    Q("q25_cosine_topk", q25 _, Some(q25Sql)),
    Q("q26_cosine_bucketed", q26 _, Some(q26Sql)),
    Q("q35_embedding_neardup", q35 _, Some(q35Sql)),
    Q("q63_quantized_topk", q63 _, Some(q63Sql)),
    Q("q77_semantic_dedup", q77 _, Some(q77Sql)),
    Q("q96_pq_adc_topk", q96 _, Some(q96Sql)),
    Q("q98_ivf_topk", q98 _, Some(q98Sql)))
}
