package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("explain", "8")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.explain("formatted")
    spark.stop()
  }
}
