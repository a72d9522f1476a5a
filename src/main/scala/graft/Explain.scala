package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "explain")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    df.explain("formatted")
    spark.stop()
  }
}
