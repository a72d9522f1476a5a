package graft.crawl

import graft.SparkSpec
import graft.functions.UrlFunctions.originOf
import graft.html.PageParser

/** Poisoned-page quarantine: at 10^10-page scale a single document
  * whose parse/extract THROWS (pathological structure hitting one of
  * the reference-faithful fail-fast branches) must not kill the stage —
  * the page is quarantined into a failures table and behaves like a
  * 404 in the crawl flow, while everything else proceeds untouched.
  */
class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  test("leaf pipeline quarantines throwing parses; docs/metrics unaffected; retried next run") {
    val poisoned = Set(3, 7)
    val spec = WebSpec(nCats = 6, nArticles = 12, poisonArticles = poisoned)
    val store = new PageStore(spec)

    // the poison is real: the sequential reference-faithful parse throws
    poisoned.foreach { a =>
      val url = store.articleUrl(0, a)
      intercept[Exception] {
        PageParser.parse(url, originOf(url), store.fetch(url).get)
      }
    }

    val cfg = CrawlConfig(workDir = tmpDir("leafq"), useBloom = false, leafEpochSize = 5)
    val lp = new LeafPipeline(spark, store, cfg)
    val work = (0 until spec.nArticles)
      .map(a => (store.articleUrl(0, a), store.articleTitle(a)))
      .toDF("url", "title")

    val n1 = lp.run(work)
    assert(n1 == spec.nArticles - poisoned.size)

    val docIds = lp.docs.read().select("doc_id").as[String].collect().toSet
    assert(docIds == (0 until spec.nArticles).filterNot(poisoned)
      .map(a => store.articleUrl(0, a)).toSet)

    val fails = lp.leafFailures.read()
      .select("url", "error").as[(String, String)].collect()
    assert(fails.map(_._1).toSet == poisoned.map(a => store.articleUrl(0, a)))
    fails.foreach { case (_, err) => assert(err.contains("NoSuchElementException")) }

    // metrics-sum ≡ docs-count invariant holds with failures present
    val metered = lp.leafMetrics.read().agg(org.apache.spark.sql.functions.sum("parsed"))
      .as[Long].head()
    assert(metered == n1)

    // second run: failed pages are NOT in docs, so they are retried
    // (and fail again → new quarantine rows); no successful doc refetched
    val n2 = lp.run(work)
    assert(n2 == 0)
    assert(lp.leafFailures.read().count() == poisoned.size * 2L)
  }

  test("frontier quarantines a throwing extract: page acts like a 404 (engine ≡ missing-page oracle)") {
    val base = WebSpec(nCats = 40, nArticles = 60)
    val store = new PageStore(base)

    // pick a fetchable non-seed category that the baseline crawl visits
    val baselineSim = SimCrawler.crawl(store)
    val poisonUrl = baselineSim.crawlOrder
      .find(u => !store.seeds.exists(_._1 == u) && store.fetch(u).isDefined)
      .getOrElse(fail("no poisonable category in baseline crawl"))

    // oracle: the SAME web where that category is a 404 — an
    // extract-failed page must contribute exactly what a missing page
    // contributes (zero links; still fetched, seen, and in crawl order)
    val poisonCat = poisonUrl.split("Category:K").last.split("_p").head.toInt
    val sim = SimCrawler.crawl(new PageStore(base.copy(forcedMissingCats = Set(poisonCat))))

    val cfg = CrawlConfig(workDir = tmpDir("chaosx"), useBloom = false,
      chaosExtractFail = Set(poisonUrl))
    val engine = new FrontierEngine(spark, store, cfg)
    engine.run()

    val engRows = engine.frontierOrdered()
      .select("url", "title", "pre_url", "isleaf")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toVector
    assert(engRows == sim.rows.map(r => (r.url, r.title, r.preUrl, r.isleaf)))
    val engOrder = engine.crawlOrder().select("url").as[String].collect().toVector
    assert(engOrder == sim.crawlOrder)
    assert(engine.seenSet().select("url").as[String].collect().toSet == sim.seen)

    // the quarantine row records the poisoned page
    val xf = engine.extractFailures.read()
      .select("url", "error").as[(String, String)].collect()
    assert(xf.map(_._1).toSeq == Seq(poisonUrl))
    assert(xf.head._2.contains("chaos: forced extract failure"))
  }

  test("storm guard: a systemic leaf-parse failure aborts the epoch loudly") {
    // 7 of 8 articles poisoned = an 87% failure rate — that is a broken
    // parser, not poisoned pages; with the guard floor lowered to test
    // scale the epoch must abort AFTER committing the audit trail
    val spec = WebSpec(nCats = 2, nArticles = 8,
      poisonArticles = (1 until 8).toSet)
    val store = new PageStore(spec)
    val cfg = CrawlConfig(workDir = tmpDir("leafstorm"), useBloom = false,
      quarantineMinFails = 2)
    val lp = new LeafPipeline(spark, store, cfg)
    val work = (0 until spec.nArticles)
      .map(a => (store.articleUrl(0, a), store.articleTitle(a)))
      .toDF("url", "title")
    val ex = intercept[IllegalStateException] { lp.run(work) }
    assert(ex.getMessage.contains("quarantine storm"))
    // audit trail survives the abort
    assert(lp.leafFailures.read().count() == 7L)
  }

  test("storm guard: frontier aborts when most extracts throw; floor holds small cases back") {
    val base = WebSpec(nCats = 10, nArticles = 20)
    val store = new PageStore(base)
    // poison BOTH seeds: superstep 0 fails every fetchable extract
    // (a seed can be a deterministic 404, so floor at 1 for test scale)
    val allSeeds = store.seeds.map(_._1).toSet
    val fetchableSeeds = allSeeds.count(u => store.fetch(u).isDefined)
    assert(fetchableSeeds >= 1)
    val stormCfg = CrawlConfig(workDir = tmpDir("xstorm"), useBloom = false,
      chaosExtractFail = allSeeds, quarantineMinFails = 1)
    val ex = intercept[IllegalStateException] {
      new FrontierEngine(spark, store, stormCfg).run()
    }
    assert(ex.getMessage.contains("quarantine storm"))

    // same poison under the DEFAULT floor (100): guard must NOT trip —
    // the crawl completes, both seed pages contributing zero links
    val calmCfg = CrawlConfig(workDir = tmpDir("xcalm"), useBloom = false,
      chaosExtractFail = allSeeds)
    val engine = new FrontierEngine(spark, store, calmCfg)
    engine.run()
    assert(engine.extractFailures.read().count() == fetchableSeeds.toLong)
  }
}
