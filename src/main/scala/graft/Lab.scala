package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Lab {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("lab", "16")
    val dir = "/root/testdata/sf0.1"
    val df = Engine.table(spark, dir, "documents")
    def time(t: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[lab] $t run$i: ${(System.nanoTime()-t0)/1e9}%.2f s  n=$n")
      }
    }
    val pairs = graft.operators.Dedup.minhashLshPairs(df, "doc_id", "text", 16, 4, 0.4)
    time("pairs-noorder")(pairs.count())
    time("pairs-ordered")(pairs.orderBy(col("id_a"), col("id_b")).count())
    time("q18-full")(SparkEntry.queries("q18_minhash_lsh_pairs")(spark, dir).count())
    spark.stop()
  }
}
