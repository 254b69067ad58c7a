package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("timeq", "16")
    val (dir, queries) =
      if (args.nonEmpty && args.last.contains("/")) (args.last, args.dropRight(1))
      else ("/root/testdata/sf0.1", args)
    for (q <- queries; i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      println(f"$q run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
