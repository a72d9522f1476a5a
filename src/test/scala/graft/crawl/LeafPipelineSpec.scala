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

  test("ST2/S9 epoch batching: kill mid-list resumes without refetch or loss") {
    val store = new PageStore(spec)
    val dir = tmpDir("leaf_epoch")
    val cfg = CrawlConfig(workDir = dir, useBloom = false, leafEpochSize = 8)
    val fe = new FrontierEngine(spark, store, cfg)
    fe.run()
    val work = LeafPipeline.workList(fe.frontier.read())
    val total = {
      // uninterrupted control run in its own table
      val cfgRef = cfg.copy(workDir = tmpDir("leaf_epoch_ref"))
      new LeafPipeline(spark, store, cfgRef).run(work)
    }
    assert(total > 16, "need >2 epochs for the kill to be mid-list")

    // "kill" after 2 committed epochs (each epoch is one atomic commit)
    val lp1 = new LeafPipeline(spark, store, cfg)
    val n1 = lp1.run(work, maxEpochs = 2)
    assert(n1 <= 16 && n1 > 0)
    val epochCommits = (1 to lp1.docs.currentVersion)
      .map(lp1.docs.lineageAt).count(_.startsWith("leafs epoch="))
    assert(epochCommits == 2, "one commit per epoch")

    // resume: a fresh pipeline over the same table crawls ONLY the rest
    val lp2 = new LeafPipeline(spark, store, cfg)
    val n2 = lp2.run(work)
    assert(n1 + n2 == total, s"resume lost/refetched docs: $n1 + $n2 != $total")
    // doc set equals the uninterrupted run's work coverage
    assert(lp2.docs.read().select("doc_id").distinct().count() == total)
    // per-partition parse metrics account for every parsed doc
    val mSum = lp2.leafMetrics.read()
      .agg(org.apache.spark.sql.functions.sum("parsed")).as[Long].head()
    assert(mSum == total)
  }

  test("F4 crawled-check keys on narrow-sanitized title (reference quirk)") {
    import org.apache.spark.sql.functions.col
    val store = new PageStore(spec)
    val cfg = CrawlConfig(workDir = tmpDir("leaf_key"), useBloom = false)
    val lp = new LeafPipeline(spark, store, cfg)
    // two work items, different urls, titles colliding AFTER sanitize:
    // "A1:x" and "A1-x" both key to "A1-x" — the reference's directory
    // existence check (`zhwiki_leafs.py:113-123`) conflates them
    val w1 = Seq((store.articleUrl(0, 1), "A1:x")).toDF("url", "title")
    val w2 = Seq((store.articleUrl(0, 2), "A1-x")).toDF("url", "title")
    assert(lp.run(w1) == 1)
    assert(lp.run(w2) == 0, "colliding sanitized title must be skipped")
    assert(lp.run(w1) == 0)
  }

  test("priority work list commits priority categories in the earliest epochs") {
    import org.apache.spark.sql.functions.col
    val store = new PageStore(spec)
    val cfg = CrawlConfig(workDir = tmpDir("leaf_pri"), useBloom = false, leafEpochSize = 2)
    val fe = new FrontierEngine(spark, store, cfg)
    fe.run()
    val frontier = fe.frontier.read()
    val priCat = store.catUrl(3)
    val work = LeafPipeline.priorityWorkList(frontier, Set(priCat))
    val priUrls = work.filter(col("priority") === 0)
      .select("url").as[String].collect().toSet
    assert(priUrls.size >= 2, s"need ≥2 priority items, got ${priUrls.size}")
    assert(work.filter(col("priority") === 1).count() > 0)

    // first epoch only: every committed doc must be a priority item
    val lp = new LeafPipeline(spark, store, cfg)
    val n1 = lp.run(work, maxEpochs = 1)
    assert(n1 > 0)
    val committed = lp.docs.read().select("doc_id").as[String].collect().toSet
    assert(committed.subsetOf(priUrls),
      s"non-priority docs in epoch 0: ${committed -- priUrls}")

    // completing the run covers exactly the plain work list
    lp.run(work)
    val all = lp.docs.read().select("doc_id").distinct().count()
    val ref = {
      val cfgRef = cfg.copy(workDir = tmpDir("leaf_pri_ref"))
      new LeafPipeline(spark, store, cfgRef).run(LeafPipeline.workList(frontier))
    }
    assert(all == ref)
  }

  test("F4 intra-run: same-run colliding sanitized titles fetch only the first in work order") {
    val store = new PageStore(spec)
    val cfg = CrawlConfig(workDir = tmpDir("leaf_key2"), useBloom = false)
    val lp = new LeafPipeline(spark, store, cfg)
    val (u1, u2) = (store.articleUrl(0, 1), store.articleUrl(0, 2))
    val w = Seq((u1, "A1:x"), (u2, "A1-x")).toDF("url", "title")
    assert(lp.run(w) == 1, "one of the colliding pair must be skipped within the run")
    val winner = lp.docs.read().select("doc_id").as[String].collect().toSeq
    assert(winner == Seq(Seq(u1, u2).min), "first in canonical work order wins")
  }

  test("fidelityF4=false: same-titled articles crawl on EVERY host; same-host collisions still conflate") {
    // multi-host web reusing one article title across hosts — the
    // reference's title-only crawled key collapses them (r3's leaf
    // bench lost 94% of a 32-host work list to exactly this)
    val mh = WebSpec(nCats = 8, nArticles = 8, nHosts = 4, withBlocked = false)
    val store = new PageStore(mh)
    val sameTitle = (0 until 4)
      .map(hc => (s"https://host$hc.graft.example/wiki/A1", "A1条目"))
      .toDF("url", "title")

    // faithful (default): ONE of the four is fetched, ever
    val lpF = new LeafPipeline(spark, store,
      CrawlConfig(workDir = tmpDir("f4_faith"), useBloom = false))
    assert(lpF.run(sameTitle) == 1, "faithful mode must conflate across hosts")

    // multi-host-safe: all four fetch; re-run still skips all
    val lpN = new LeafPipeline(spark, store,
      CrawlConfig(workDir = tmpDir("f4_safe"), useBloom = false, fidelityF4 = false))
    assert(lpN.run(sameTitle) == 4, "non-faithful mode must crawl every host")
    assert(lpN.run(sameTitle) == 0, "cross-run skip must still hold per (host, title)")

    // same-host sanitize collision conflates in BOTH modes (the quirk
    // fidelityF4=false removes is only the cross-host one)
    val sameHost = Seq(
      (store.articleUrl(0, 1), "A1:x"),
      (store.articleUrl(0, 2), "A1-x")).toDF("url", "title")
    val lpN2 = new LeafPipeline(spark, store,
      CrawlConfig(workDir = tmpDir("f4_safe2"), useBloom = false, fidelityF4 = false))
    assert(lpN2.run(sameHost) == 1, "same-host sanitize collision must still conflate")
  }

  test("metrics backfill: a docs commit orphaned by a crash is re-metered on resume") {
    import org.apache.spark.sql.functions.sum
    val store = new PageStore(spec)
    val cfg = CrawlConfig(workDir = tmpDir("leaf_rec"), useBloom = false, leafEpochSize = 4)
    val fe = new FrontierEngine(spark, store, cfg)
    fe.run()
    val work = LeafPipeline.workList(fe.frontier.read())
    val lp = new LeafPipeline(spark, store, cfg)
    lp.run(work, maxEpochs = 1)

    // simulate a crash BETWEEN the docs append and its metrics append:
    // a docs commit exists whose metrics rows were never written
    lp.docs.append(lp.docs.read().limit(3), "leafs epoch=99 n=3", coalesceTo = 1)

    // any subsequent run first reconciles: one aggregate backfill row
    val lp2 = new LeafPipeline(spark, store, cfg)
    lp2.run(work, maxEpochs = 0)
    val backfill = lp2.leafMetrics.read()
      .filter(org.apache.spark.sql.functions.col("partition") === -1)
      .select("epoch", "parsed").as[(Int, Long)].collect().toSeq
    assert(backfill == Seq((99, 3L)))
    // sum invariant holds again: metrics total == docs rows
    val mSum = lp2.leafMetrics.read().agg(sum("parsed")).as[Long].head()
    assert(mSum == lp2.docs.read().count())
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
    assert(!byStatus.contains("no_file_page"), "every File: page must resolve")

    // X9: media_url resolved through the file page's .fullMedia anchor,
    // S11: payload bytes stored; n_bytes matches, oracle bytes identical
    import org.apache.spark.sql.functions.col
    val rows = lp.media.read()
      .select("wiki_url", "media_url", "payload", "n_bytes", "status")
      .as[(String, Option[String], Option[Array[Byte]], Int, String)]
      .collect()
    rows.foreach { case (wikiUrl, mediaUrl, payload, nBytes, status) =>
      val expected = store.fetch(wikiUrl).flatMap(PageParser.resolveFullMedia)
      assert(mediaUrl == expected.map(_._1), s"resolution hop differs for $wikiUrl")
      if (status == "ok") {
        assert(payload.isDefined && payload.get.length == nBytes)
        assert(payload.get.sameElements(store.fetchMediaBytes(mediaUrl.get).get))
      } else assert(payload.isEmpty && nBytes == 0)
    }

    // multimodal decode over the REAL media table payloads
    val metas = graft.ops.Multimodal.decodeMediaTable(lp.media.read()).collect()
    assert(metas.length == byStatus("ok"))
    assert(metas.forall(m => m.n_bytes >= 64 && m.width >= 64 && m.height >= 64))
  }
}
