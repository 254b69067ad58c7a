package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Bench, Engine}
import graft.operators.{Dedup, LshEncoding}

/** Phase decomposition of q49's composition (LSH pairs -> connected
  * components) on the REAL corpus — guide §1 measure-first for the
  * round-18 q49/q53/q62 target. Mirrors the internal phases of
  * [[graft.operators.Dedup.connectedComponents]] (hook / jump /
  * contract are local defs there, so the expressions are replicated
  * here for timing only — this tool is measurement-only and never part
  * of a query path). Each phase runs `iters` times (min reported — the
  * storm-robust statistic for fixed work) and is bracketed by the
  * spin/memory probes so degraded windows are named.
  *
  * Usage: runMain graft.tools.CcPhases [sfDir] [iters]
  */
object CcPhases {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = Engine.session("cc-phases", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def probe(): String = {
      val s = Bench.cpuProbeMs().map(p => f"$p%.0f").getOrElse("-")
      val m = Bench.memProbeMs().map(p => f"$p%.0f").getOrElse("-")
      s"spin=${s}ms mem=${m}ms"
    }
    def docs: DataFrame = Engine.table(spark, sfDir, "documents")
    def timed(name: String)(f: => Unit): Unit = {
      val pre = probe()
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        f
        val sec = (System.nanoTime() - t0) / 1e9
        Bench.resetSession(spark)
        sec
      }
      val post = probe()
      val all = ts.map(t => f"$t%.2f").mkString(" ")
      println(f"[ccphase] $name%-34s min=${ts.min}%7.3f s  [$all]  pre[$pre] post[$post]")
    }

    // warm the JVM/codegen once end to end
    spark.sparkContext.setJobDescription("warm: q49 end-to-end")
    Bench.exec(Dedup.connectedComponents(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 4, 0.4, LshEncoding.Auto))
      .orderBy(col("id")))
    Bench.resetSession(spark)

    // A. q49 end-to-end (reference)
    timed("A q49 end-to-end noop") {
      spark.sparkContext.setJobDescription("A: q49 end-to-end")
      Bench.exec(Dedup.connectedComponents(
        Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 4, 0.4, LshEncoding.Auto))
        .orderBy(col("id")))
    }

    // B. LSH pairs alone -> noop (the q18 shape)
    timed("B lsh pairs noop") {
      spark.sparkContext.setJobDescription("B: lsh pairs noop")
      Bench.exec(Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 4, 0.4, LshEncoding.Auto))
    }

    // C. LSH pairs -> parquet write (the pairs0 materialization shape)
    timed("C lsh pairs -> parquet write") {
      spark.sparkContext.setJobDescription("C: pairs -> parquet")
      Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 4, 0.4, LshEncoding.Auto)
        .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
        .write.mode("overwrite").parquet("/tmp/ccphases/pairs0")
    }

    val pairs0 = spark.read.parquet("/tmp/ccphases/pairs0")
    println(s"[ccphase] pairs0 rows = ${pairs0.count()}")
    Bench.resetSession(spark)

    // I. pure re-write of the stored pairs (write cost w/o LSH compute)
    timed("I stored pairs -> parquet write") {
      spark.sparkContext.setJobDescription("I: parquet -> parquet")
      spark.read.parquet("/tmp/ccphases/pairs0")
        .write.mode("overwrite").parquet("/tmp/ccphases/pairs0_copy")
    }

    // D. CC machinery over the stored pairs (LSH cost excluded)
    timed("D cc over stored pairs noop") {
      spark.sparkContext.setJobDescription("D: cc(stored) noop")
      Bench.exec(Dedup.connectedComponents(
        spark.read.parquet("/tmp/ccphases/pairs0")
          .select(col("src").as("id_a"), col("dst").as("id_b"))))
    }

    // phase mirrors of connectedComponents' round-0 internals
    def edges0 = pairs0.unionByName(
      pairs0.select(col("dst").as("src"), col("src").as("dst")))
    def hook(e: DataFrame): DataFrame = e
      .groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), col("src")).as("cluster_id"))
    def jump(lbl: DataFrame): DataFrame = lbl
      .join(lbl.select(col("id").as("cluster_id"), col("cluster_id").as("g")),
        Seq("cluster_id"), "left")
      .select(col("id"), coalesce(col("g"), col("cluster_id")).as("cluster_id"))
    def contract(e: DataFrame, lbl: DataFrame): DataFrame = e
      .join(lbl.select(col("id").as("src"), col("cluster_id").as("ls")), "src")
      .join(lbl.select(col("id").as("dst"), col("cluster_id").as("ld")), "dst")
      .select(col("ls").as("src"), col("ld").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()

    timed("E hook(edges0) noop") {
      spark.sparkContext.setJobDescription("E: hook noop")
      Bench.exec(hook(edges0))
    }
    timed("F jump(hook(edges0)) noop") {
      spark.sparkContext.setJobDescription("F: hook+jump noop")
      Bench.exec(jump(hook(edges0)))
    }
    timed("G map0.cache + contract + count") {
      spark.sparkContext.setJobDescription("G: map0 fill + contract count")
      val map0 = jump(hook(edges0)).cache()
      val rep0 = contract(edges0, map0).cache()
      rep0.count()
      map0.unpersist(); rep0.unpersist()
    }
    timed("H directed canonical contract+cnt") {
      spark.sparkContext.setJobDescription("H: directed canonical contract")
      val map0 = jump(hook(edges0)).cache()
      val repC = pairs0
        .join(map0.select(col("id").as("src"), col("cluster_id").as("ls")), "src")
        .join(map0.select(col("id").as("dst"), col("cluster_id").as("ld")), "dst")
        .select(least(col("ls"), col("ld")).as("src"),
          greatest(col("ls"), col("ld")).as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct().cache()
      repC.count()
      map0.unpersist(); repC.unpersist()
    }

    // executed plans (AQE-final) for the round-0 internals
    {
      val map0 = jump(hook(edges0)).cache()
      val rep0 = contract(edges0, map0).cache()
      rep0.count()
      println("[ccphase] ===== map0 executed plan =====")
      println(map0.queryExecution.executedPlan.toString.take(8000))
      println("[ccphase] ===== rep0 executed plan =====")
      println(rep0.queryExecution.executedPlan.toString.take(8000))
      map0.unpersist(); rep0.unpersist()
      Bench.resetSession(spark)
    }

    spark.stop()
  }
}
