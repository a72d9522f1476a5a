package graft.crawl

import graft.SparkSpec
import graft.functions.UrlFunctions.originOf
import graft.html.PageParser

/** Span-sequence equality (BASELINE.json per-row invariant): the
  * distributed leaf pipeline must produce, per doc, EXACTLY the span
  * sequence (kind, text, media_ref, order) the single-threaded parse
  * produces, regardless of partitioning; plus P7 skip semantics and the
  * media stage.
  */
class LeafPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val spec = WebSpec(nCats = 40, nArticles = 60)

  test("docs spans ≡ sequential parse (per-row span-sequence equality)") {
    val store = new PageStore(spec)
    val dir = tmpDir("leaf")
    val cfg = CrawlConfig(workDir = dir, useBloom = false)

    // frontier first (work list comes from crawled frontier rows)
    val fe = new FrontierEngine(spark, store, cfg)
    fe.run()
    val lp = new LeafPipeline(spark, store, cfg)
    val work = LeafPipeline.workList(fe.frontier.read())
    val n = lp.run(work)
    assert(n > 0)

    // oracle: sequential parse of the same work list
    val items = work.as[(String, String)].collect().sortBy(_._1)
    val expected = items.flatMap { case (url, _) =>
      store.fetch(url).flatMap(h => PageParser.parse(url, originOf(url), h))
        .map(p => url -> p.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)))
    }.toMap

    val got = lp.docs.read()
      .selectExpr("doc_id", "spans")
      .as[(String, Seq[(String, String, String, Int)])]
      .collect()
      .toMap

    assert(got.keySet == expected.keySet, "doc set differs")
    expected.foreach { case (docId, spans) =>
      assert(got(docId) == spans, s"span sequence differs for $docId")
    }
    // every doc has ordered offsets 0..n-1 and a leading text span
    got.values.foreach { spans =>
      assert(spans.map(_._4) == spans.indices)
      assert(spans.head._1 == "text")
    }
  }

  test("P7 crawled-check: second run fetches nothing new") {
    val store = new PageStore(spec)
    val dir = tmpDir("leaf2")
    val cfg = CrawlConfig(workDir = dir, useBloom = false)
    val fe = new FrontierEngine(spark, store, cfg)
    fe.run()
    val lp = new LeafPipeline(spark, store, cfg)
    val work = LeafPipeline.workList(fe.frontier.read())
    val n1 = lp.run(work)
    val n2 = lp.run(work)
    assert(n1 > 0 && n2 == 0)
  }

  test("media stage: bytes fetched per distinct image, failures recorded") {
    val store = new PageStore(spec)
    val dir = tmpDir("leaf3")
    val cfg = CrawlConfig(workDir = dir, useBloom = false)
    val fe = new FrontierEngine(spark, store, cfg)
    fe.run()
    val lp = new LeafPipeline(spark, store, cfg)
    lp.run(LeafPipeline.workList(fe.frontier.read()))
    val n = lp.fetchMedia()
    assert(n > 0)
    val byStatus = lp.media.read().groupBy("status").count()
      .as[(String, Long)].collect().toMap
    assert(byStatus.getOrElse("ok", 0L) > 0)
    // deterministic failure injection (~1/13) should surface
    assert(byStatus.contains("failed"))
  }
}
