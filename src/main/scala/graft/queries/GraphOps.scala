package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.operators.Graph

/** Graph-signal surface: PageRank over the customer↔supplier
  * interaction graph (orders⋈lineitem), the stand-in for the host-link
  * authority prior a web-corpus pipeline feeds into quality-weighted
  * sampling. Fixed 3-iteration power method — the oracle replays the
  * identical arithmetic as three chained CTE iterations.
  */
object GraphOps {

  private val Iters = 3
  private val Damping = 0.85

  private def q69(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    // symmetrize: prefixed namespaces are disjoint, so the reversed
    // copy cannot collide with a forward edge — plain unionAll is safe
    val edges = cs.unionByName(cs.select(col("dst").as("src"), col("src").as("dst")))
    Graph.pageRank(edges, Iters, Damping)
      .select(col("node"), roundSafe(col("pr"), 7).as("pr"))
      .orderBy(col("node"))
  }

  private val q69Sql = {
    val d = "0.85::DOUBLE"
    def iter(prev: String, i: Int): String =
      s"""c$i AS (SELECT dst, sum(pr / outdeg) AS i$i
             FROM $prev JOIN ed ON $prev.node = ed.src GROUP BY dst),
          r$i AS (SELECT nodes.node,
                    (1.0::DOUBLE - $d) / n + $d * coalesce(i$i, 0.0::DOUBLE) AS pr
                  FROM nodes CROSS JOIN nn LEFT JOIN c$i ON nodes.node = c$i.dst)"""
    s"""WITH cs AS (SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        e AS (SELECT src, dst FROM cs UNION ALL SELECT dst, src FROM cs),
        deg AS (SELECT src AS dsrc, count(*)::DOUBLE AS outdeg FROM e GROUP BY src),
        ed AS (SELECT e.src, e.dst, outdeg FROM e JOIN deg ON e.src = deg.dsrc),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        r0 AS (SELECT node, 1.0::DOUBLE / n AS pr FROM nodes CROSS JOIN nn),
        ${iter("r0", 1)},
        ${iter("r1", 2)},
        ${iter("r2", 3)}
        SELECT node, round(pr + 1e-9, 7) AS pr FROM r3 ORDER BY node"""
  }

  private val MinCooccur = 2

  /** Per-node triangle counts over the REPEAT part co-purchase graph
    * (part pairs sharing ≥ 2 orders — the standard market-basket noise
    * prune; single co-occurrence on uniform order data is dominated by
    * chance pairings and yields a near-complete, meaningless graph).
    * Edge generation is bounded per order (quadratic only in order
    * size) and aggregated with map-side combine before the threshold;
    * the count itself is degree-oriented — see [[Graph.triangleCounts]].
    * The oracle replays the naive a<b<c three-edge join, fine at oracle
    * scale; the Spark side runs the orientation shape that survives
    * hub skew. */
  private def q72(s: SparkSession, dir: String): DataFrame = {
    val l = table(s, dir, "lineitem").select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val r = l.select(col("ok"), col("pk").as("pk2"))
    // shuffle_hash: the per-order pair expansion needs no sorted runs,
    // and skipping the two 600k-row sorts roughly halves edge-gen time
    val edges = l.join(r.hint("shuffle_hash"), Seq("ok")).where(col("pk") < col("pk2"))
      .groupBy(col("pk").as("a"), col("pk2").as("b"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= MinCooccur)
      .select(col("a"), col("b"))
    Graph.triangleCounts(edges)
      .select(col("node").cast("long").as("node"), col("triangles"))
      .orderBy(col("node"))
  }

  private val q72Sql =
    s"""WITH e AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
          FROM lineitem l1 JOIN lineitem l2
            ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= $MinCooccur),
        t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1
          JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
          JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        n AS (SELECT x AS node FROM t
              UNION ALL SELECT y FROM t
              UNION ALL SELECT z FROM t)
        SELECT node::BIGINT AS node, count(*)::BIGINT AS triangles
        FROM n GROUP BY 1 ORDER BY 1"""

  val all: Seq[Q] = Seq(
    Q("q69_pagerank", q69 _, Some(q69Sql)),
    Q("q72_triangle_count", q72 _, Some(q72Sql)))
}
