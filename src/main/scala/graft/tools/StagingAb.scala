package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Bench, Engine}
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** ABAB probe for the q56/q66 cascade-staging trade (r18 VERDICT item
  * 6): lazy re-derivation (the shipped default) vs staging the
  * UNEXPLODED (id, toks) cascade to parquet once. Run at sf0.1 AND a
  * heavier corpus (sfg1) — the trade is corpus-weight-dependent (r8:
  * neutral; q67: staging loses on short docs). Measurement-only tool.
  *
  * Usage: runMain graft.tools.StagingAb [sfDir] [rounds]
  */
object StagingAb {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = Engine.session("staging-ab", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def docs: DataFrame = Engine.table(spark, sfDir, "documents")

    def q56(staged: Boolean): DataFrame =
      Dedup.incrementalLshPairs(
        docs.where(col("doc_id") % 10 === 7),
        docs.where(col("doc_id") % 10 =!= 7),
        "doc_id", "text", 16, 4, 0.4, stageToks = staged)
        .orderBy(col("new_id"), col("corpus_id"))

    def q66(staged: Boolean): DataFrame = {
      if (!staged)
        graft.operators.TextAnalysis.vocabCoverage(docs, "doc_id", "text", 20)
          .orderBy(col("id"))
      else {
        // staged variant: the UNEXPLODED token arrays land in parquet
        // once; both consumers (vocab count + per-doc coverage) explode
        // from the staged leaf
        docs.select(col("doc_id").as("id"), tokens(col("text")).as("__toks"))
          .write.mode("overwrite").parquet("/tmp/stagingab/toks66")
        val t = spark.read.parquet("/tmp/stagingab/toks66")
        val toks = t.select(col("id"), explode_outer(col("__toks")).as("tok"))
          .where(col("tok").isNotNull)
        val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("__c"))
          .orderBy(col("__c").desc, col("tok")).limit(20)
          .select(col("tok"), lit(1).as("__inv"))
        val per = toks.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy(col("id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("__inv").isNull, 1L).otherwise(0L)).as("n_oov"))
        docs.select(col("doc_id").as("id")).join(per, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("n_oov"), lit(0L)).as("n_oov"),
            graft.queries.roundSafe(
              when(coalesce(col("n_tokens"), lit(0L)) === 0, 0.0)
                .otherwise(col("n_oov").cast("double") / col("n_tokens").cast("double")),
              6).as("oov_frac"))
          .orderBy(col("id"))
      }
    }

    def one(mk: Boolean => DataFrame, staged: Boolean): (Double, Double) = {
      val t0 = System.nanoTime()
      Bench.exec(mk(staged))
      val sec = (System.nanoTime() - t0) / 1e9
      Bench.resetSession(spark)
      (sec, Bench.cpuProbeMs().getOrElse(-1.0))
    }

    Seq(("q56", q56 _), ("q66", q66 _)).foreach { case (name, mk) =>
      one(mk, false); one(mk, true) // warm both
      (1 to rounds).foreach { i =>
        val (tl, pl) = one(mk, false)
        val (ts, ps) = one(mk, true)
        println(f"[stageab] $name round $i  lazy=$tl%6.3f s (probe $pl%.0f ms)   staged=$ts%6.3f s (probe $ps%.0f ms)")
      }
    }
    spark.stop()
  }
}
