package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`), pure Column expressions (zip_with/aggregate fold —
  * no UDF, stays in codegen).
  *
  * Scale design (100 TB): [[bruteForceTopK]] broadcasts the (small)
  * query set against the full corpus — one scan, no shuffle of the
  * corpus, per-partition top-k via the rank window only after the
  * similarity filter. [[bucketedTopK]] is the IVF-style scale path:
  * vectors are pre-assigned a coarse bucket (centroid / cluster id);
  * the probe joins queries to their own bucket only, cutting the scan
  * to corpus/num_buckets per query. Both compute in DOUBLE with a
  * left-to-right fold so results are engine-reproducible.
  */
object SimilaritySearch {

  /** Left-fold dot product in DOUBLE (codegen'd custom expression; the
    * fold order matches the SQL oracle's list_reduce exactly). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpr.dotProduct(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine from a pair dot product and per-ROW precomputed norms —
    * norms are map-stage work; only one dot product runs per pair. */
  private def cosinePrepped(d: Column, normA: Column, normB: Column): Column =
    d / (normA * normB)

  /** Exact top-k neighbors for each query vector (query ids drawn from
    * the corpus itself). Ranks on the rounded similarity with id
    * tiebreak so ordering is reproducible across engines. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val q = corpus
      .where(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        l2Norm(col(vecCol)).as("q_norm"))
    val scored = corpus
      .select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"),
        l2Norm(col(vecCol)).as("c_norm"))
      .crossJoin(broadcast(q))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosinePrepped(dot(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** IVF-style bucketed ANN: candidates restricted to the query's own
    * coarse bucket (`bucketCol`, e.g. a cluster/centroid id). */
  def bucketedTopK(corpus: DataFrame, idCol: String, vecCol: String,
      bucketCol: String, queryIds: Seq[Long], k: Int): DataFrame = {
    val q = corpus
      .where(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        l2Norm(col(vecCol)).as("q_norm"), col(bucketCol).as("q_bucket"))
    val scored = corpus
      .select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"),
        l2Norm(col(vecCol)).as("c_norm"), col(bucketCol).cast("long").as("bucket"))
      .join(broadcast(q), col("bucket") === col("q_bucket").cast("long"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("bucket"), col("cand_id"),
        round(cosinePrepped(dot(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
