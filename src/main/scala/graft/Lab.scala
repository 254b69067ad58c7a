package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Lab {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("lab", "32")
    val dir = "/root/testdata/sf0.1"
    def time(t: String)(f: => Unit): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        println(f"[lab] $t run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    val q18 = SparkEntry.queries("q18_minhash_lsh_pairs")
    time("q18-count")(q18(spark, dir).count())
    time("q18-noop")(Bench.exec(q18(spark, dir)))
    val pairs = graft.operators.Dedup.minhashLshPairs(
      Engine.table(spark, dir, "documents"), "doc_id", "text", 16, 4, 0.4)
    time("q18-noop-nosort")(Bench.exec(pairs))
    spark.stop()
  }
}
