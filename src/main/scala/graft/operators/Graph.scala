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
    * @param scope    release handle for the two caches this call pins
    *                 ([[graft.CacheScope]]); close it when done acting
    *                 on the returned plan
    * @return (node, pr) for every node appearing in `edges`, where pr
    *         sums to ~1 over nodes reachable of the teleport+walk mix
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double,
      scope: graft.CacheScope = graft.CacheScope.unmanaged): DataFrame = {
    require(iters >= 1 && damping > 0.0 && damping < 1.0)
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"))
    // The degree-annotated edge list and the node set are consumed by
    // EVERY iteration, and each sits on top of the caller's (possibly
    // expensive) edge-construction lineage. persist() is lazy — the
    // build still runs zero jobs — and turns k-iteration plans from k
    // re-executions of the edge build into one fill + k cache scans.
    // The caches are part of the returned plan's working set (every
    // action re-reads them), not a leak; one-shot callers release them
    // by closing `scope` after their action.
    val withDeg = scope.pin(e.join(
      e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg")), "src"))
    val nodes = scope.pin(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct())
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

  /** Per-node triangle counts over an undirected graph, by degree
    * orientation — the standard scalable shape (e.g. Suri & Vassilvitskii
    * "Counting Triangles and the Curse of the Last Reducer", WWW'11):
    * orient every edge from the (degree, id)-smaller endpoint to the
    * larger, enumerate wedges at each source, and close them against
    * the oriented edge list. Each triangle is produced EXACTLY once (at
    * its unique orientation-minimal vertex), and wedge fan-out at a hub
    * is bounded by its ORIENTED out-degree ≤ O(√|E|), which is what
    * kills the quadratic hub blowup a naive neighbor self-join has.
    *
    * Shuffles: degree agg, two orientation joins, the wedge self-join
    * (keyed on source), and the closing hash join on the canonical
    * (min,max) pair — all equi-joins, no OR conditions, no cartesian.
    *
    * @param edges (a, b) node-id pairs; symmetric/duplicate/self edges
    *              tolerated (canonicalized + deduped internally)
    * @param scope release handle for the oriented-edge cache this call
    *              pins (same convention as [[pageRank]])
    * @return (node, triangles) for every node in ≥ 1 triangle
    */
  def triangleCounts(edges: DataFrame,
      scope: graft.CacheScope = graft.CacheScope.unmanaged): DataFrame = {
    val canon = edges
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = canon.select(col("a").as("node"))
      .unionByName(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // `oriented` feeds three branches (both wedge sides + the closing
    // set). Exchange reuse dedupes the shuffles BELOW it, but the
    // degree-join probe and the orientation projection over all |E|
    // edges would re-run per branch — pin the oriented list itself
    // (narrow: two id columns), same discipline as pageRank's edges.
    val oriented = scope.pin(canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("dst")))
    // wedges at each source, as canonical unordered (x < y) pairs
    val wedges = oriented.select(col("src"), col("dst").as("x"))
      .join(oriented.select(col("src"), col("dst").as("y")), "src")
      .where(col("x") < col("y"))
    // each canonical edge appears in `oriented` in exactly one direction,
    // so the closing set re-canonicalized is dedup-free
    val closing = oriented.select(
      least(col("src"), col("dst")).as("x"), greatest(col("src"), col("dst")).as("y"))
    val triangles = wedges.join(closing, Seq("x", "y"))
    triangles
      .select(explode(array(col("src"), col("x"), col("y"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("triangles"))
  }
}
