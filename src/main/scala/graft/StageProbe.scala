package graft

/** One-leg stage-bench probe: `runMain graft.StageProbe <cpus> [nUrls]`.
  * Used to separate scheduler/skew effects from shared-VM noise when a
  * ScalingBench leg looks implausible. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(32)
    val nUrls = args.lift(1).map(_.toInt).getOrElse(2000000)
    val spark = Sessions.local(cpus, s"probe-$cpus")
    if (args.length > 2 && args(2) == "diag") diag(spark, cpus, nUrls)
    else if (args.length > 2 && args(2) == "dedup") {
      // optional 4th arg = row count (scale-ladder evidence: 10^7, 10^8)
      val rows = args.lift(3).map(_.toInt).getOrElse(10000000)
      val m = Bench.dedupBench(spark, nSeen = rows, nCand = rows)
      println(m.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    } else if (args.length > 2 && args(2) == "recall") {
      val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
      val m = Bench.annRecallBench(spark, sfDir)
      println(m.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.4f" }.mkString(" "))
    } else if (args.length > 2 && args(2) == "cc") {
      val nEdges = args.lift(3).map(_.toInt).getOrElse(10000000)
      val compLen = args.lift(4).map(_.toInt).getOrElse(100)
      val shape = args.lift(5).getOrElse("chain")
      // passes > 1 separates JIT/codegen warm-up from steady state: the
      // 8-round chain job compiles ~a dozen distinct codegen stages, so
      // a cold JVM pays C2 compile storms across every round
      val passes = args.lift(6).map(_.toInt).getOrElse(1)
      (1 to passes).foreach { p =>
        val m = Bench.ccBench(spark, nEdges, compLen, shape)
        println(s"pass=$p " +
          m.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
      }
    } else if (args.length > 2 && args(2) == "textdedup") {
      val nDocs = args.lift(3).map(_.toLong).getOrElse(1000000L)
      val m = Bench.textDedupBench(spark, nDocs)
      println(m.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    } else if (args.length > 2 && args(2) == "cnd") {
      val nDocs = args.lift(3).map(_.toLong).getOrElse(1000000L)
      val m = Bench.corpusNearDupBench(spark, nDocs)
      println(m.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.4f" }.mkString(" "))
    } else if (args.length > 2 && args(2) == "ix") {
      val nDocs = args.lift(3).map(_.toLong).getOrElse(1000000L)
      // passes > 1 prints each pass: pass 1 carries whatever fresh-JVM
      // cold cost the warm-up didn't absorb; later passes are steady
      // state (the cc-mode lesson applied to the small rungs)
      val passes = args.lift(4).map(_.toInt).getOrElse(1)
      for (p <- 1 to passes) {
        val m = Bench.interleaveBench(spark, nDocs)
        println(s"pass=$p " + m.toSeq.sortBy(_._1)
          .map { case (k, v) => f"$k=$v%.4f" }.mkString(" "))
      }
    } else if (args.length > 2 && args(2) == "curation") {
      val nDocs = args.lift(3).map(_.toLong).getOrElse(1000000L)
      val nBatches = args.lift(4).map(_.toInt).getOrElse(20)
      val withBaseline = args.lift(5).forall(_ == "baseline")
      val dupPeriod = args.lift(6).map(_.toInt).getOrElse(10)
      val targetPartKb = args.lift(7).map(_.toLong).getOrElse(0L)
      val m = Bench.curationBench(spark, nDocs, nBatches, withBaseline,
        dupPeriod, targetPartKb)
      println(m.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.4f" }.mkString(" "))
    } else if (args.length > 2 && args(2) == "ccplan") {
      import org.apache.spark.sql.functions.{col, lit, pmod}
      val edges = spark.range(1000000L)
        .filter(pmod(col("id"), lit(100)) =!= 99)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      val round = graft.ops.DedupGraph.starRound(edges)
      round.collect()
      round.explain("formatted")
    } else if (args.length > 2 && args(2) == "crecall") {
      val m = Bench.annClusteredRecallBench(spark)
      println(m.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.4f" }.mkString(" "))
    } else if (args.length > 2 && args(2) == "crawl") {
      // gated like the committed artifact's crawl leg: steal + foreign
      // CPU + memory-bandwidth (the third signal both CPU gates miss)
      val m = Bench.retryOnSteal("crawl", "crawl_urls_per_sec",
        maxTries = args.lift(4).map(_.toInt).getOrElse(2)) {
        Bench.crawlBench(spark, nUrls, nHosts = 32)
      }
      println(m.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    } else if (args.length > 2 && args(2) == "gate") {
      // smoke test of the 3-signal retry gate at tiny scale: prints the
      // kept steal/foreign/mem-bw keys so the gate's plumbing is
      // verifiable without a full bench run
      val m = Bench.retryOnSteal("stage", "stage_urls_per_sec", maxTries = 2) {
        Bench.stageBench(spark, nUrls)
      }
      println(m.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.3f" }.mkString(" "))
    } else {
      val m = Bench.stageBench(spark, nUrls)
      println(m.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    }
    spark.stop()
  }

  /** Per-partition row counts and per-partition wall time of the fetch
    * stage — separates key-skew from scheduler starvation. */
  def diag(spark: org.apache.spark.sql.SparkSession, cpus: Int, nUrls: Int): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.crawl.{FrontierEngine, PageStore, RobotsPolicy, WebSpec}
    val nHosts = 256
    val spec = WebSpec(nCats = nUrls, nArticles = 1000, nHosts = nHosts,
      branching = 4, articlesPerCat = 4, withBlocked = false)
    val store = new PageStore(spec)
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val salted = spark.range(nUrls)
      .as[Long]
      .map(i => (s"https://host${i % nHosts}.graft.example/wiki/Category:K$i", i))
      .toDF("url", "seq")
      .repartition(nPart, FrontierEngine.saltedPartitionKey(col("url"), 4))
      .as[(String, Long)]
    val fetchFn = FrontierEngine.politeFetch(store, RobotsPolicy.allowAll, 0.0, 4) _
    val stats = salted.mapPartitions { it =>
      val t0 = System.nanoTime()
      var n = 0L
      var links = 0L
      fetchFn(it).foreach { r =>
        n += 1
        if (r._3.isDefined)
          links += FrontierEngine.extractLinks((r._1, r._2, r._3.get)).size
      }
      Iterator((org.apache.spark.TaskContext.getPartitionId(), n, links,
        (System.nanoTime() - t0) / 1e9))
    }.collect().sortBy(_._1)
    stats.foreach { case (p, n, l, s) => println(f"part=$p%3d rows=$n%8d links=$l%9d sec=$s%7.2f") }
    println(f"total=${stats.map(_._2).sum} maxSec=${stats.map(_._4).max}%.2f " +
      f"sumSec=${stats.map(_._4).sum}%.2f wallIfBalanced=${stats.map(_._4).sum / cpus}%.2f")
  }
}
