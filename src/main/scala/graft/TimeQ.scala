package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("timeq", "16")
    for (q <- args; i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"$q run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
