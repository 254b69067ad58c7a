package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column (SemDeDup, Abbas et
  * al. 2023, arXiv:2303.09540): within each coarse cluster, examples
  * whose cosine similarity to an earlier-id example exceeds a threshold
  * are dropped; survivors are summarized by their similarity to the
  * cluster centroid. The coarse assignment is pluggable — production
  * would feed [[SimilaritySearch.ivfIndex]]'s KMeans assignment; the
  * driver-gated query uses the dataset's label column so the DuckDB
  * oracle can replay the whole pipeline deterministically.
  *
  * Scale shape: the pair scan is the q35 bucketed self-join (quadratic
  * per CLUSTER, never global; probe side `Engine.spread`), the drop
  * set is a distinct on the dropped ids only, survivors come from one
  * broadcast-able anti-join, and the centroid is a per-dimension
  * hash aggregate (posexplode → (cluster, dim) partial avg) — the same
  * two-shuffle shape a distributed KMeans iteration uses. Cluster
  * centroids (|clusters| × dim doubles) broadcast back for scoring.
  */
object SemDedup {

  /** Shared projected lineage: (vid, cl, v double-array, nrm). Every
    * public entry preps ONCE and derives its branches from the same
    * frame, so the per-row cast + 64-element l2Norm fold isn't
    * re-derived per consumer. */
  private def prep(df: DataFrame, idCol: String, clusterCol: String,
      vecCol: String): DataFrame =
    df.select(col(idCol).as("vid"), col(clusterCol).as("cl"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", SimilaritySearch.l2Norm(col("v")))

  /** Per-cluster mean vector: (cl, centroid array<double>). */
  def centroids(df: DataFrame, clusterCol: String, vecCol: String): DataFrame =
    centroidsPrepped(df.select(col(clusterCol).as("cl"),
      col(vecCol).cast("array<double>").as("v")))

  private def centroidsPrepped(e: DataFrame): DataFrame =
    e.select(col("cl"), posexplode(col("v")))
      .groupBy(col("cl"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("cl"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("centroid"))

  /** Ids dropped by single-pass semantic dedup: every id with ANY
    * lower-id same-cluster neighbor at rounded cosine ≥ tau —
    * first-occurrence-wins in the q65 segment-dedup sense.
    * Deliberately NOT the sequential greedy scan (which would keep an
    * id whose only near neighbors were themselves dropped): the
    * single-pass rule over-drops on similarity CHAINS in exchange for
    * a fully parallel, replayable predicate; at tau high enough to
    * mean "near-duplicate", chains are transitively near-identical
    * anyway. Rounding before the compare keeps the drop set
    * engine-portable (identical to the q35 pair contract). */
  def dropIds(df: DataFrame, idCol: String, clusterCol: String, vecCol: String,
      tau: Double): DataFrame =
    dropIdsPrepped(prep(df, idCol, clusterCol, vecCol), tau)

  private def dropIdsPrepped(e: DataFrame, tau: Double): DataFrame = {
    val a = graft.Engine.spread(e.select(col("vid").as("id_a"), col("cl"),
      col("v").as("va"), col("nrm").as("na")))
    val b = e.select(col("vid").as("id_b"), col("cl").as("clb"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("cl") === col("clb") && col("id_a") < col("id_b"))
      .where(round(SimilaritySearch.cosinePrepped(
        SimilaritySearch.dot(col("va"), col("vb")), col("na"), col("nb")), 6)
        >= tau)
      .select(col("id_b").as("drop_id"))
      .distinct()
  }

  /** Per-cluster dedup summary: total size, drops, survivors, and the
    * survivors' mean cosine to the (all-member) cluster centroid. */
  def summary(df: DataFrame, idCol: String, clusterCol: String, vecCol: String,
      tau: Double): DataFrame = {
    // one prep shared by every branch (pair scan, kept set, centroids,
    // totals) — previously each re-derived the cast + norm lineage
    val e = prep(df, idCol, clusterCol, vecCol)
    val drops = dropIdsPrepped(e, tau)
    val kept = e.join(drops, col("vid") === col("drop_id"), "left_anti")
    val cents = centroidsPrepped(e)
      .withColumn("cnrm", SimilaritySearch.l2Norm(col("centroid")))
    // null-SAFE joins throughout: a null cluster key is a legitimate
    // group (groupBy keeps it, dropIds' equi-join never drops from it),
    // but equi-joining on cl would exclude it from keptStats and then
    // report its rows as 100% dropped when none were
    val keptStats = kept.join(broadcast(cents.withColumnRenamed("cl", "__c_cl")),
        col("cl") <=> col("__c_cl"))
      .withColumn("ccos", SimilaritySearch.cosinePrepped(
        SimilaritySearch.dot(col("v"), col("centroid")), col("nrm"), col("cnrm")))
      .groupBy(col("cl"))
      .agg(count(lit(1)).as("n_kept"), avg(col("ccos")).as("mean_cent_cos"))
      .withColumnRenamed("cl", "__k_cl")
    e.groupBy(col("cl")).agg(count(lit(1)).as("n"))
      .join(keptStats, col("cl") <=> col("__k_cl"), "left")
      .select(col("cl"), col("n"),
        (col("n") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("mean_cent_cos"))
  }
}
