package graft

/** Paired scaling-efficiency measurement (the BASELINE.json two-
  * cluster-size criterion, evidenced at two parallelism levels since
  * the sandbox has no real cluster): runs the CPU-bound fetch+parse
  * stage and the politeness-bound fetch at local[N] and local[4N] in
  * ONE JVM (same JIT state, back-to-back — this host is a shared VM
  * with spiky steal, so paired measurement beats separate processes).
  *
  * Emits one JSON line:
  * {"n":{...},"n4":{...},"stage_scaling_efficiency":E, ...}
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val baseCpus = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
    val urls = sys.env.getOrElse("SPARK_GRAFT_BENCH_URLS", "2000000").toInt
    val politeUrls = sys.env.getOrElse("SPARK_GRAFT_BENCH_POLITE_URLS", "150000").toInt

    def measure(cpus: Int): (Map[String, Double], Map[String, Double]) = {
      val spark = Sessions.local(cpus, s"graft-scale-$cpus")
      val s = Bench.stageBench(spark, urls)
      val p = Bench.politeBench(spark, politeUrls, nHosts = 256, rps = 20.0)
      spark.stop()
      (s, p)
    }

    val (s1, p1) = measure(baseCpus)
    val (s4, p4) = measure(baseCpus * 4)
    def fmt(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":${"%.4f".format(v)}""" }
        .mkString("{", ",", "}")
    val eff = (s4("stage_urls_per_sec") / s1("stage_urls_per_sec")) / 4.0
    println(
      s"""{"metric":"stage_scaling_efficiency","value":${"%.4f".format(eff)},"unit":"ratio",""" +
        s""""n_cpus":$baseCpus,"n":${fmt(s1 ++ p1)},"n4":${fmt(s4 ++ p4)},""" +
        s""""polite_floor_eff_n":${"%.3f".format(p1("polite_efficiency_vs_floor"))},""" +
        s""""polite_floor_eff_n4":${"%.3f".format(p4("polite_efficiency_vs_floor"))}}""")
  }
}
