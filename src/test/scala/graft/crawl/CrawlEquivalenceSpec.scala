package graft.crawl

import graft.SparkSpec
import org.apache.spark.sql.Row

/** The correctness keystone (SURVEY.md §7.3 / BASELINE.json): the Spark
  * frontier engine must reproduce the single-threaded oracle EXACTLY —
  * frontier row order (Tot_urls/CSV order), crawl order (queue pops),
  * and the final URL-seen set.
  */
class CrawlEquivalenceSpec extends SparkSpec {

  private def engineVsSim(spec: WebSpec, cfgMod: CrawlConfig => CrawlConfig = identity): Unit = {
    val store = new PageStore(spec)
    val sim = SimCrawler.crawl(store,
      if (spec.withBlocked) Set(PageStore.BlockedUrl) else Set.empty)

    val cfg = cfgMod(CrawlConfig(
      workDir = tmpDir("crawl"),
      blockedUrls = if (spec.withBlocked) Set(PageStore.BlockedUrl) else Set.empty,
      robots = spec.robots,
      useBloom = false))
    val engine = new FrontierEngine(spark, store, cfg)
    engine.run()

    // frontier rows: exact order + content
    val engRows = engine.frontierOrdered()
      .select("url", "title", "pre_url", "isleaf")
      .collect()
      .map { case Row(u: String, t: String, p: String, l: Int) => (u, t, p, l) }
      .toVector
    val simRows = sim.rows.map(r => (r.url, r.title, r.preUrl, r.isleaf))
    assert(engRows.size == simRows.size,
      s"row count: engine=${engRows.size} sim=${simRows.size}")
    engRows.zip(simRows).zipWithIndex.foreach { case ((e, s), i) =>
      assert(e == s, s"row $i differs: engine=$e sim=$s")
    }

    // crawl order: exact pop order
    val engOrder = engine.crawlOrder().select("url").collect().map(_.getString(0)).toVector
    assert(engOrder == sim.crawlOrder, "crawl order differs")

    // seen set
    val engSeen = engine.seenSet().select("url").collect().map(_.getString(0)).toSet
    assert(engSeen == sim.seen, "seen set differs")
  }

  test("engine ≡ oracle on size-S web (blocked cat, dups, cycles, pagination, 404s)") {
    engineVsSim(WebSpec(nCats = 40, nArticles = 60))
  }

  test("engine ≡ oracle on a denser web (more cross links)") {
    engineVsSim(WebSpec(seed = 7, nCats = 80, nArticles = 100, branching = 4, articlesPerCat = 6))
  }

  test("engine ≡ oracle under robots disallow") {
    val robots = RobotsPolicy(Map("zh.wikipedia.org" -> Seq("/wiki/Category:K3")))
    engineVsSim(WebSpec(nCats = 40, nArticles = 60, robots = robots))
  }

  test("engine ≡ oracle with bloom prefilter enabled") {
    engineVsSim(WebSpec(nCats = 40, nArticles = 60),
      c => c.copy(useBloom = true, bloomExpectedItems = 10000, bloomMinRows = 1))
  }

  test("engine ≡ oracle with aggressive state compaction mid-crawl") {
    // compact frontier/seen/metrics every 2 supersteps: content-neutral
    // by construction, but this pins the resume/stableVersion machinery
    // against compaction commits interleaving with superstep appends
    engineVsSim(WebSpec(nCats = 40, nArticles = 60),
      c => c.copy(compactEvery = 2, compactTargetBytes = 1L << 20))
  }

  test("engine ≡ oracle with the bucketed seen mirror active") {
    // mirror refresh every 2 supersteps, 4 buckets: the seen anti-join
    // runs as (deltas → bucketed mirror) for most of the crawl; result
    // must be identical to the plain path (bloom on, to cover the
    // might-branch chain too)
    engineVsSim(WebSpec(nCats = 40, nArticles = 60),
      c => c.copy(useBloom = true, bloomExpectedItems = 10000, bloomMinRows = 1,
        compactEvery = 2, seenBuckets = 4))
  }

  test("engine ≡ oracle with the full table lifecycle: compaction + mirrors + vacuum") {
    engineVsSim(WebSpec(nCats = 40, nArticles = 60),
      c => c.copy(useBloom = true, bloomExpectedItems = 10000, bloomMinRows = 1,
        compactEvery = 2, seenBuckets = 4, vacuumKeepVersions = 2))
  }

  test("engine ≡ oracle with CUCKOO seen-filter shards (north rule's other filter)") {
    // identical lifecycle to the sharded-bloom scenario, but the
    // persistent shards are cuckoo filters — the probe/anti-join
    // structure must be filter-agnostic (superset contract only)
    engineVsSim(WebSpec(nCats = 40, nArticles = 60),
      c => c.copy(useBloom = true, bloomExpectedItems = 10000, bloomMinRows = 1,
        compactEvery = 2, seenBuckets = 4, seenFilterKind = "cuckoo"))
  }

  test("bucketed mirror survives a catalog wipe (fresh-JVM resume path)") {
    val spec = WebSpec(nCats = 40, nArticles = 60)
    val store = new PageStore(spec)
    val sim = SimCrawler.crawl(store)
    val dir = tmpDir("mirror_resume")
    val cfg = CrawlConfig(workDir = dir, useBloom = false,
      compactEvery = 2, seenBuckets = 4)

    // run 3 supersteps via run() so the loop-boundary mirror refresh
    // fires (k=2), then "crash": drop the catalog entry (a new JVM has
    // an empty catalog)
    val e1 = new FrontierEngine(spark, store, cfg.copy(maxSupersteps = 3))
    e1.run()
    val wid = graft.functions.TextKernels.md5Hex(dir).take(10)
    val dropped = spark.catalog.listTables().collect()
      .filter(_.name.endsWith(wid))
    assert(dropped.length == 2, s"expected both mirrors registered, got ${dropped.toSeq}")
    dropped.foreach(t => spark.sql(s"DROP TABLE ${t.name}"))

    // fresh engine re-registers the mirror from VERSION + files only
    val e2 = new FrontierEngine(spark, store, cfg)
    e2.run()
    val engRows = e2.frontierOrdered()
      .select("url", "title", "pre_url", "isleaf")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toVector
    assert(engRows == sim.rows.map(r => (r.url, r.title, r.preUrl, r.isleaf)))
    assert(e2.seenSet().select("url").collect().map(_.getString(0)).toSet == sim.seen)
  }

  test("deep multi-cycle crawl: lifecycle bounds state files; mid-crawl kill resumes identically") {
    // branching=1 → a category chain (cross-links shortcut it to ~23
    // BFS levels): many supersteps of tiny batches — the shape where
    // unbounded per-superstep appends made state re-reads
    // metadata-bound (r2). Full lifecycle on a tight cadence:
    // compaction+mirror+vacuum every 4 supersteps → ~6 cycles, with
    // the kill landing between cycles.
    val spec = WebSpec(nCats = 120, nArticles = 100, branching = 1, articlesPerCat = 2)
    val store = new PageStore(spec)
    val sim = SimCrawler.crawl(store, Set(PageStore.BlockedUrl))
    val cfg = CrawlConfig(workDir = tmpDir("deep"),
      blockedUrls = Set(PageStore.BlockedUrl),
      useBloom = true, bloomExpectedItems = 10000, bloomMinRows = 1,
      compactEvery = 4, seenBuckets = 4, vacuumKeepVersions = 2)

    // kill mid-crawl (past several compaction+vacuum cycles), resume
    val e1 = new FrontierEngine(spark, store, cfg.copy(maxSupersteps = 12))
    assert(e1.run() == 12)
    val e2 = new FrontierEngine(spark, store, cfg)
    val resumed = e2.run()
    assert(12 + resumed > 20, s"chain web too shallow: ${12 + resumed} supersteps")

    val engRows = e2.frontierOrdered()
      .select("url", "title", "pre_url", "isleaf")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toVector
    assert(engRows == sim.rows.map(r => (r.url, r.title, r.preUrl, r.isleaf)))
    assert(e2.seenSet().select("url").collect().map(_.getString(0)).toSet == sim.seen)
    // the dedicated crawl_order table reproduces the exact pop order
    // across the kill/resume boundary and its own compaction/vacuum
    val engOrder = e2.crawlOrder().select("url").collect().map(_.getString(0)).toVector
    assert(engOrder == sim.crawlOrder, "crawl order differs after lifecycle + resume")

    // file growth is bounded by the cycle, not the crawl length:
    // ≤ compacted base (4 buckets / size-targeted) + compactEvery ×
    // appendFiles ≈ 20, vs 20+ supersteps × 4 ≈ 90+ uncompacted
    def nFiles(t: graft.tables.IceLite) = t.filesAt(t.currentVersion).length
    assert(nFiles(e2.seen) < 40, s"seen files unbounded: ${nFiles(e2.seen)}")
    assert(nFiles(e2.frontier) < 40, s"frontier files unbounded: ${nFiles(e2.frontier)}")
    assert(nFiles(e2.order) < 40, s"crawl_order files unbounded: ${nFiles(e2.order)}")
    // ON-DISK bound INCLUDING vacuumed history — the queue is no longer
    // vacuum-exempt (the order log is its own table), so total parquet
    // on disk is bounded by the vacuum cadence, not the superstep count
    def diskFiles(sub: String): Int = {
      val d = java.nio.file.Paths.get(cfg.workDir, sub)
      var n = 0
      scala.util.Using.resource(java.nio.file.Files.walk(d)) { s =>
        val it = s.iterator()
        while (it.hasNext) { if (it.next().toString.endsWith(".parquet")) n += 1 }
      }
      n
    }
    val qDisk = diskFiles("queue")
    val oDisk = diskFiles("crawl_order")
    assert(qDisk < 60, s"queue on-disk files unbounded: $qDisk")
    assert(oDisk < 60, s"crawl_order on-disk files unbounded: $oDisk")
  }

  test("sharded blooms: resume loads persisted shards instead of rescanning the seen table") {
    val spec = WebSpec(nCats = 40, nArticles = 60)
    val store = new PageStore(spec)
    val sim = SimCrawler.crawl(store)
    val dir = tmpDir("shard_resume")
    // bloom active from superstep 0; shards refresh at the compaction
    // cadence (every 2 supersteps)
    val cfg = CrawlConfig(workDir = dir,
      useBloom = true, bloomExpectedItems = 10000, bloomMinRows = 1,
      compactEvery = 2, seenBuckets = 4)

    val e1 = new FrontierEngine(spark, store, cfg.copy(maxSupersteps = 3))
    e1.run()
    assert(e1.lastBloomInit == "built-shards",
      s"first activation should build shards distributed, got ${e1.lastBloomInit}")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "seen_blooms", "GENERATION")),
      "shard generation not persisted")

    // fresh engine ("new JVM"): blooms must LOAD, not rebuild from a
    // full-table scan, and the crawl must still match the oracle
    val e2 = new FrontierEngine(spark, store, cfg)
    e2.run()
    assert(e2.lastBloomInit == "loaded-shards",
      s"resume should load persisted shards, got ${e2.lastBloomInit}")
    val engRows = e2.frontierOrdered()
      .select("url", "title", "pre_url", "isleaf")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toVector
    assert(engRows == sim.rows.map(r => (r.url, r.title, r.preUrl, r.isleaf)))
    assert(e2.seenSet().select("url").collect().map(_.getString(0)).toSet == sim.seen)
    val engOrder = e2.crawlOrder().select("url").collect().map(_.getString(0)).toVector
    assert(engOrder == sim.crawlOrder, "crawl order differs with sharded blooms")
  }

  test("parallelism invariance: same result at 2 fetch partitions") {
    engineVsSim(WebSpec(nCats = 30, nArticles = 40),
      c => c.copy(fetchPartitions = 2))
  }

  test("fetch sub-batching invariance: same result with 7-row batches") {
    // tiny fetchBatchRows forces many sequential chunks per superstep —
    // results must be byte-identical to single-batch fetching
    engineVsSim(WebSpec(nCats = 30, nArticles = 40),
      c => c.copy(fetchBatchRows = 7))
  }

  test("resume: killing after k supersteps and restarting yields identical state") {
    val spec = WebSpec(nCats = 40, nArticles = 60)
    val store = new PageStore(spec)
    val sim = SimCrawler.crawl(store)
    val dir = tmpDir("resume")
    val cfg = CrawlConfig(workDir = dir, useBloom = false)

    // run only 2 supersteps, then abandon the engine ("crash")
    val e1 = new FrontierEngine(spark, store, cfg)
    e1.init()
    var nextSeq = e1.queue.read().count()
    val (nq1, _) = e1.superstep(0, nextSeq)
    nextSeq += nq1
    val (nq2, _) = e1.superstep(1, nextSeq)
    assert(nq2 > 0, "web too small for a resume test")

    // fresh engine over the same workDir resumes from snapshots
    val e2 = new FrontierEngine(spark, store, cfg)
    e2.run()

    val engRows = e2.frontierOrdered()
      .select("url", "title", "pre_url", "isleaf")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toVector
    assert(engRows == sim.rows.map(r => (r.url, r.title, r.preUrl, r.isleaf)))
    val engSeen = e2.seenSet().select("url").collect().map(_.getString(0)).toSet
    assert(engSeen == sim.seen)
  }
}
