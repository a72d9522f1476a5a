package graft

/** Batch plan dumper: `runMain graft.ExplainAll <sfDir> <outDir> <q1> <q2> ...`
  * (or `all`). Writes each query's `.explain("formatted")` — the FINAL
  * adaptive plan after execution — to `<outDir>/<query>.txt` in one JVM,
  * so capturing the r6 before/after plan artifacts doesn't pay a Spark
  * startup per query.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val names =
      if (args.length > 2 && args(2) != "all") args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "explain-all")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect() // finalize the AQE plan
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"$n.txt"), plan)
      println(s"[explain-all] wrote $n")
    }
    spark.stop()
  }
}
