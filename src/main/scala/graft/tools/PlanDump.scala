package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization rounds' plan-evidence capture (plans/rNN/<q>_before.txt
  * / _after.txt). One session for the whole batch with the harness
  * session reset between queries, so construction-eager queries
  * (Matching staging, LSH guards) behave exactly as under Bench.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names @ _*) = args: @unchecked
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Engine.session("graft-plandump", cpus)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"PLANDUMP wrote $name ($suffix)")
      graft.Bench.resetSession(spark)
    }
    spark.stop()
  }
}
