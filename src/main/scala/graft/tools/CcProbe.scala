package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Bench, Engine}

/** Crossover probe for [[graft.operators.Dedup.connectedComponents]]'
  * driver-finish edge cap: times the DISTRIBUTED path (contraction
  * rounds + residual union-find, cap forced below the input) against
  * the DRIVER one-pass path (cap forced above it) on synthetic
  * chain-cluster graphs of controlled edge counts — the same
  * cluster-of-near-dups shape LSH pair graphs take (q49's sf0.1 graph
  * is 6.17M edges in ~5-doc template clusters). The cap default in
  * Dedup.scala is set from this table (SCALE.md round-7), not argued.
  * Usage: runMain graft.tools.CcProbe [nEdges ...]
  */
object CcProbe {

  /** Chains of `clusterSize` vertices: edge i links consecutive
    * vertices inside cluster i/(clusterSize-1). Chain clusters are the
    * adversarial shape for the hook+jump rounds (cliques collapse in
    * round 0; chains exercise the pointer jumping). */
  def edges(spark: SparkSession, nEdges: Long, clusterSize: Int = 5): DataFrame = {
    val k = clusterSize - 1
    spark.range(nEdges)
      .select((expr(s"id div $k") * clusterSize + col("id") % k).as("id_a"),
        (expr(s"id div $k") * clusterSize + col("id") % k + 1).as("id_b"))
  }

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(1000000L, 2000000L, 4000000L, 6000000L, 8000000L, 12000000L)
    val spark = Engine.session("cc-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    def time(cap: Long, e: DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop sink, not count(): count prunes the label projection
      Bench.exec(graft.operators.Dedup.connectedComponents(e, driverFinishMaxEdges = cap))
      val t = (System.nanoTime() - t0) / 1e9
      Bench.resetSession(spark)
      t
    }
    sizes.foreach { n =>
      val e = edges(spark, n)
      e.write.mode("overwrite").parquet(s"/tmp/ccprobe/edges_$n")
      val stored = spark.read.parquet(s"/tmp/ccprobe/edges_$n")
      // distributed = the production shape: contraction rounds with a
      // 2M residual finish, fast path forced OFF by a cap under the
      // input size. Warm both paths once (JIT/codegen), then best-of-2.
      val capDist = math.min(2000000L, n - 1)
      time(capDist, stored); time(Long.MaxValue, stored)
      val dist = (1 to 2).map(_ => time(capDist, stored)).min
      val drv = (1 to 2).map(_ => time(Long.MaxValue, stored)).min
      println(f"[ccprobe] edges=$n%9d distributed=$dist%6.2f s driver=$drv%6.2f s")
    }
    spark.stop()
  }
}
