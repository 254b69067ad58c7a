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

  val all: Seq[Q] = Seq(
    Q("q69_pagerank", q69 _, Some(q69Sql)))
}
