package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators for corpus curation. PageRank over a host/link
  * graph is the classic crawl-quality prior (domain authority feeding
  * quality-weighted sampling); connected components (in [[Dedup]])
  * covers the clustering side.
  *
  * [[pageRank]] runs a FIXED number of power iterations as one static
  * plan — no driver loop state, no checkpointing needed at 3-5 iters;
  * each iteration is one join of the rank vector to the (outdeg-
  * annotated) edge list plus one sum-by-destination, i.e. two shuffles
  * per iteration keyed on node id, the same shape GraphX/Pregel
  * executes. Teleport mass arrives via a broadcast one-row node count,
  * so the whole thing stays lazy (no action at plan construction).
  * Dangling mass is not redistributed — callers feeding symmetrized
  * edge lists (the q69 usage) have no dangling nodes by construction;
  * nodes without in-links still receive the teleport term.
  */
object Graph {

  /** @param edges    directed (src, dst) string-id pairs, pre-deduped
    * @param iters    power iterations (plan depth grows linearly)
    * @param damping  walk-follow probability (teleport = 1 - damping)
    * @return (node, pr) for every node appearing in `edges`, where pr
    *         sums to ~1 over nodes reachable of the teleport+walk mix
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double): DataFrame = {
    require(iters >= 1 && damping > 0.0 && damping < 1.0)
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"))
    val withDeg = e.join(
      e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg")), "src")
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val nCount = nodes.agg(count(lit(1)).cast("double").as("__n"))
    val r0 = nodes.join(broadcast(nCount))
      .select(col("node"), (lit(1.0) / col("__n")).as("pr"))
    (1 to iters).foldLeft(r0) { (ranks, _) =>
      // column names are disjoint across the two join sides, so the
      // shared edge-list lineage can't produce ambiguous attributes
      val contrib = ranks
        .join(withDeg, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("outdeg")).as("__in"))
        .withColumnRenamed("dst", "node")
      nodes.join(contrib, Seq("node"), "left")
        .join(broadcast(nCount))
        .select(col("node"),
          ((lit(1.0) - damping) / col("__n") +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("pr"))
    }
  }
}
