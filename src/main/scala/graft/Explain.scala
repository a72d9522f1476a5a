package graft

/** Plan audit: `runMain graft.Explain <sfDir> <query> [exec]`.
  * With `exec`, runs the query first so the printed plan is the FINAL
  * adaptive plan (AQE stage reuse, runtime join strategy) — the static
  * plan of an unexecuted AQE query shows neither. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "explain")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    if (args.length > 2 && args(2) == "exec") df.collect() // finalizes the AQE plan in-place
    df.explain("formatted")
    spark.stop()
  }
}
