package graft

import graft.crawl.{CrawlConfig, FrontierEngine, PageStore, WebSpec}

/** Crawl-superstep cost probe: `runMain graft.CrawlProbe [nCats] [nHosts]`
  * runs the SAME engine configuration as the frozen Bench.crawlBench
  * (saltFactor 16, bloom on, defaults otherwise) on a throwaway temp
  * dir, printing total wall + fetched counts. Combine with
  * GRAFT_SUPERSTEP_TIMING=1 for the per-phase breakdown. Feeds
  * OPTIMIZATION_r06.md, not the driver artifact.
  */
object CrawlProbe {
  def main(args: Array[String]): Unit = {
    val nCats = if (args.length > 0) args(0).toInt else 5000
    val nHosts = if (args.length > 1) args(1).toInt else 32
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "crawl-probe")
    val dir = java.nio.file.Files.createTempDirectory("graftcrawlprobe")
    try {
      val spec = WebSpec(nCats = nCats, nArticles = nCats * 2, nHosts = nHosts,
        branching = 4, articlesPerCat = 4, nSeeds = math.max(nHosts, 4),
        withBlocked = false)
      val store = new PageStore(spec)
      val cfg = CrawlConfig(workDir = dir.toString, blockedUrls = Set.empty,
        useBloom = true, saltFactor = 16)
      val engine = new FrontierEngine(spark, store, cfg)
      val t0 = System.nanoTime()
      val steps = engine.run()
      val sec = (System.nanoTime() - t0) / 1e9
      val fetched = engine.crawledCount()
      println(f"[crawl-probe] cats=$nCats steps=$steps fetched=$fetched " +
        f"sec=$sec%.1f urls_per_sec=${fetched / sec}%.0f")
    } finally {
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) { w =>
        w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      }
    }
    spark.stop()
  }
}
