package graft
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "qt")
    names.foreach { n =>
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"$n pass$pass: ${(System.nanoTime()-t0)/1e9}%.2fs rows=$cnt")
      }
    }
    spark.stop()
  }
}
