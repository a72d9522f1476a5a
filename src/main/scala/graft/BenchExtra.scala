package graft

/** Isolated per-query timing with a noop sink (guide §1.4):
  * `runMain graft.BenchExtra <sfDir> [reps] [q1 q2 ...]` — each query is
  * computed via `write.format("noop")` so the timing covers every column
  * of every row with no collect/checksum overhead, `reps` passes each
  * (first pass = codegen+scan warm-up, min of the rest reported).
  * Separate from the frozen graft.Bench harness: numbers here feed
  * OPTIMIZATION_r06.md, not the driver artifact.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "bench-extra")
    val out = names.map { n =>
      spark.sparkContext.setJobDescription(s"bench-extra: $n")
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = if (times.length > 1) times.tail.min else times.head
      println(f"[bench-extra] $n%-28s cold=${times.head}%7.3f warm=$warm%7.3f")
      n -> (times.head, warm)
    }
    spark.sparkContext.setJobDescription(null)
    val js = out.map { case (n, (c, w)) =>
      f""""$n":{"cold":$c%.3f,"warm":$w%.3f}""" }.mkString("{", ",", "}")
    println(s"""{"bench_extra":$js,"sf":"$sfDir"}""")
    spark.stop()
  }
}
