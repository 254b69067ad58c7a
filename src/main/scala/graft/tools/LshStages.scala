package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.{Bench, Engine}
import graft.operators.{Dedup, LshEncoding}

/** Stage-level decomposition of the q18/q49 LSH pair generation at
  * sf0.1 (guide §1/§7.1 stand-in for the Spark UI on this headless
  * box): per-stage task counts and wall, plus the AQE-final executed
  * plan — evidence for where the pair-join parallelism actually lands.
  * Measurement-only tool.
  *
  * Usage: runMain graft.tools.LshStages [sfDir]
  */
object LshStages {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("lsh-stages", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val stages = ArrayBuffer[(Int, Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, si.numTasks, wall, si.name.takeWhile(_ != '\n').take(60)))
        }
      }
    })

    def docs = Engine.table(spark, sfDir, "documents")
    // warm
    Bench.exec(Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 4, 0.4, LshEncoding.Auto))
    Bench.resetSession(spark)
    stages.clear()

    val df = Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 4, 0.4, LshEncoding.Auto)
    val t0 = System.nanoTime()
    Bench.exec(df)
    val sec = (System.nanoTime() - t0) / 1e9
    // give listener events a moment to drain
    Thread.sleep(1000)
    println(f"[lshstage] lsh pairs noop total $sec%.3f s")
    stages.sortBy(_._1).foreach { case (id, n, wall, name) =>
      println(f"[lshstage] stage=$id%3d tasks=$n%3d wall=$wall%6d ms  $name")
    }
    println("[lshstage] ===== executed plan =====")
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
