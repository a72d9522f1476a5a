package graft

/** Scaling-efficiency measurement (the BASELINE.json two-cluster-size
  * criterion, evidenced at two parallelism levels since the sandbox has
  * no real cluster): the CPU-bound fetch+parse stage and the
  * politeness-bound fetch at local[N] and local[4N].
  *
  * Each leg MUST run in its own JVM (`runMain graft.ScalingBench <cpus>`;
  * `tools/scaling.sh` runs both and combines): measured r2, a local[32]
  * leg run in the same JVM after a local[8] leg degrades ~3× (heap/GC
  * state carried across SparkSessions), which would fake a terrible
  * scaling number. Fresh JVMs also model the real criterion — two
  * separate clusters — more closely. Each leg self-warms (stageBench
  * does a JIT warm-up pass + best-of-2).
  *
  * Legacy no-arg mode runs both legs in one JVM (kept for comparison;
  * do not use its output as scaling evidence).
  */
object ScalingBench {

  private def fmt(m: Map[String, Double]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":${"%.4f".format(v)}""" }
      .mkString("{", ",", "}")

  def measure(cpus: Int, urls: Int, politeUrls: Int): Map[String, Double] = {
    val spark = Sessions.local(cpus, s"graft-scale-$cpus")
    val s = Bench.stageBench(spark, urls)
    // the politeness-bound fetch is budget-capped (can't scale with
    // cores by design — only its floor-efficiency matters), so repeat
    // trials may skip it: SPARK_GRAFT_SKIP_POLITE=1
    val p =
      if (sys.env.get("SPARK_GRAFT_SKIP_POLITE").contains("1")) Map.empty[String, Double]
      else Bench.politeBench(spark, politeUrls, nHosts = 256, rps = 20.0)
    spark.stop()
    s ++ p
  }

  def main(args: Array[String]): Unit = {
    val urls = sys.env.getOrElse("SPARK_GRAFT_BENCH_URLS", "2000000").toInt
    val politeUrls = sys.env.getOrElse("SPARK_GRAFT_BENCH_POLITE_URLS", "150000").toInt

    args.headOption match {
      case Some(cpusStr) => // one leg, fresh JVM — the supported mode
        val cpus = cpusStr.toInt
        val m = measure(cpus, urls, politeUrls)
        println(s"""{"metric":"scaling_leg","cpus":$cpus,"leg":${fmt(m)}}""")

      case None => // legacy both-in-one-JVM mode
        val baseCpus = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
        val m1 = measure(baseCpus, urls, politeUrls)
        val m4 = measure(baseCpus * 4, urls, politeUrls)
        val eff = (m4("stage_urls_per_sec") / m1("stage_urls_per_sec")) / 4.0
        println(
          s"""{"metric":"stage_scaling_efficiency","value":${"%.4f".format(eff)},"unit":"ratio",""" +
            s""""n_cpus":$baseCpus,"n":${fmt(m1)},"n4":${fmt(m4)},""" +
            s""""polite_floor_eff_n":${"%.3f".format(m1("polite_efficiency_vs_floor"))},""" +
            s""""polite_floor_eff_n4":${"%.3f".format(m4("polite_efficiency_vs_floor"))}}""")
    }
  }
}
