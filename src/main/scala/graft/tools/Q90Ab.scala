package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Bench, Engine}
import graft.functions.TextFunctions._

/** ABAB probe for q90's w1-marginal formulation (r17 change, r18
  * VERDICT item 3: confirm or revert): variant A = the shipped form
  * (w1 counts derived from biCounts by aggregation), variant B = the
  * pre-r17 form (w1 counts from a third tokenize+shingle cascade).
  * Interleaved A B A B ... runs with probe brackets so one storm
  * window cannot fake a verdict. Measurement-only tool.
  *
  * Usage: runMain graft.tools.Q90Ab [sfDir] [rounds]
  */
object Q90Ab {

  private def common(df: DataFrame, fromBi: Boolean): DataFrame = {
    val toks = df.select(col("doc_id").as("id"), tokens(col("text")).as("__toks"))
    val bi = toks
      .select(col("id"), explode_outer(shingles(col("__toks"), 2)).as("bg"))
      .where(col("bg").isNotNull)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val biCounts = bi.groupBy(col("bg")).agg(count(lit(1)).as("__c2"))
    val w1Counts =
      if (fromBi) biCounts
        .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
        .agg(sum(col("__c2")).as("__c1"))
      else bi.groupBy(col("w1")).agg(count(lit(1)).as("__c1"))
    val per = bi.join(biCounts, Seq("bg"))
      .join(w1Counts, Seq("w1"))
      .select(col("id"),
        (-log2(col("__c2").cast("double") / col("__c1"))).as("__bits"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("__bits")) / count(lit(1))).as("__avg"))
    df.select(col("doc_id").as("id")).join(per, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        graft.queries.roundSafe(coalesce(col("__avg"), lit(0.0)), 4).as("avg_bits"))
      .orderBy(col("id"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = Engine.session("q90-ab", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def docs = Engine.table(spark, sfDir, "documents")
    def one(fromBi: Boolean): (Double, Double) = {
      val t0 = System.nanoTime()
      Bench.exec(common(docs, fromBi))
      val sec = (System.nanoTime() - t0) / 1e9
      Bench.resetSession(spark)
      (sec, Bench.cpuProbeMs().getOrElse(-1.0))
    }
    // warm both
    one(true); one(false)
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    (1 to rounds).foreach { i =>
      val (ta, pa) = one(true)
      val (tb, pb) = one(false)
      as += ta; bs += tb
      println(f"[q90ab] round $i  A(fromBi)=$ta%6.3f s (probe $pa%.0f ms)   B(cascade)=$tb%6.3f s (probe $pb%.0f ms)")
    }
    println(f"[q90ab] A(fromBi) min=${as.min}%.3f median=${as.sorted.apply(as.size / 2)}%.3f   B(cascade) min=${bs.min}%.3f median=${bs.sorted.apply(bs.size / 2)}%.3f")
    spark.stop()
  }
}
