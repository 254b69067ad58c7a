package graft
/** Warm per-query timings through the SAME noop sink Bench uses (a
  * count() over a projection-only plan prunes every expression and
  * under-measures kernels — the round-2 lesson). Honors
  * SPARK_GRAFT_CPUS and SPARK_GRAFT_ITERS like Bench. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "2").toInt.max(1)
    val spark = Engine.session("timeq", cpus)
    val (dir, queries) =
      if (args.nonEmpty && args.last.contains("/")) (args.last, args.dropRight(1))
      else ("/root/testdata/sf0.1", args)
    require(queries.nonEmpty,
      "usage: TimeQ <query>... [sfDir]  (a lone dir arg times nothing)")
    val unknown = queries.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — relative sfDirs " +
        "need a slash (e.g. ./sf0.01) or they parse as query names")
    for (q <- queries) {
      for (i <- 1 to iters) {
        val t0 = System.nanoTime()
        Bench.exec(SparkEntry.queries(q)(spark, dir))
        println(f"$q run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
      // between-query hygiene, matching Bench: a multi-query TimeQ run
      // must time each query from the same clean-session footing
      Bench.resetSession(spark)
    }
    spark.stop()
  }
}
