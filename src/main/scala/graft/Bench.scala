package graft

import org.apache.spark.sql.SparkSession

import graft.crawl.{CrawlConfig, FrontierEngine, LeafPipeline, PageStore, WebSpec}

/** Benchmark main (driver contract): one JSON line on stdout.
  *
  * Sections:
  *  - queries: per-query wall seconds over SPARK_GRAFT_SF_DIR (after a
  *    warm-up pass so JVM/codegen startup doesn't pollute per-query
  *    numbers; "total" stays the cold total for comparability);
  *  - crawl: the BASELINE.json headline — sustained fetched-URLs/sec and
  *    frontier dedup rate on a deterministic multi-host synthetic web at
  *    the session's parallelism. Scaling efficiency is evidenced by
  *    running this main at SPARK_GRAFT_CPUS=8 vs 32 on the SAME spec
  *    (no real cluster in the sandbox — BASELINE.md records both).
  */
object Bench {

  def crawlBench(spark: SparkSession, nCats: Int, nHosts: Int): Map[String, Double] = {
    val spec = WebSpec(
      nCats = nCats, nArticles = nCats * 2, nHosts = nHosts,
      branching = 4, articlesPerCat = 4, nSeeds = math.max(nHosts, 4),
      withBlocked = false)
    val store = new PageStore(spec)
    val dir = java.nio.file.Files.createTempDirectory("graftbench").toString
    val cfg = CrawlConfig(workDir = dir, blockedUrls = Set.empty,
      useBloom = true, bloomMinRows = 500000)
    val engine = new FrontierEngine(spark, store, cfg)
    val t0 = System.nanoTime()
    engine.run()
    val crawlSec = (System.nanoTime() - t0) / 1e9
    val fetched = engine.crawled.read().count()
    val frontierRows = engine.frontier.read().count()
    val seenN = engine.seenSet().count()

    // leaf stage throughput (parse-dominated)
    val lp = new LeafPipeline(spark, store, cfg)
    val work = LeafPipeline.workList(engine.frontier.read())
    val t1 = System.nanoTime()
    val parsed = lp.run(work)
    val leafSec = (System.nanoTime() - t1) / 1e9

    Map(
      "crawl_fetched_urls" -> fetched.toDouble,
      "crawl_sec" -> crawlSec,
      "crawl_urls_per_sec" -> fetched / crawlSec,
      "frontier_rows" -> frontierRows.toDouble,
      "dedup_checked_rows_per_sec" -> frontierRows / crawlSec,
      "seen_urls" -> seenN.toDouble,
      "leaf_parsed_docs" -> parsed.toDouble,
      "leaf_docs_per_sec" -> (if (leafSec > 0) parsed / leafSec else 0.0)
    )
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val crawlCats = sys.env.getOrElse("SPARK_GRAFT_BENCH_CATS", "20000").toInt
    val spark = Sessions.local(cpus, "graft-bench")

    // relational/pipeline queries: cold pass (counts as total), then a
    // measured warm pass per query
    val cold0 = System.nanoTime()
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val coldTotal = (System.nanoTime() - cold0) / 1e9
    val warm = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }

    val crawl = crawlBench(spark, crawlCats, nHosts = 32)

    val qs = warm.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${"%.4f".format(v)}""" }
      .mkString("{", ",", "}")
    val cs = crawl.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${"%.4f".format(v)}""" }
      .mkString("{", ",", "}")
    val total = coldTotal + crawl("crawl_sec") + warm.values.sum
    println(
      s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec",""" +
        s""""queries":$qs,"crawl":$cs,"cpus":$cpus,""" +
        s""""warm_queries_sec":${"%.3f".format(warm.values.sum)},""" +
        s""""cold_queries_sec":${"%.3f".format(coldTotal)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
