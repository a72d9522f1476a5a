package graft

import org.apache.spark.sql.SparkSession

import graft.crawl.{CrawlConfig, FrontierEngine, LeafPipeline, PageStore, RobotsPolicy, WebSpec}
import graft.functions.UrlFunctions.hostOf
import org.apache.spark.sql.functions.{array, col, concat, count, countDistinct, explode, lit, max, pmod, sum, udf, when, xxhash64}

/** Benchmark main (driver contract): one JSON line on stdout.
  *
  * Sections:
  *  - queries: per-query wall seconds over SPARK_GRAFT_SF_DIR (after a
  *    warm-up pass so JVM/codegen startup doesn't pollute per-query
  *    numbers; "total" stays the cold total for comparability);
  *  - crawl: the BASELINE.json headline — sustained fetched-URLs/sec,
  *    frontier dedup rate (10M×10M bloom-vs-exact anti-join), and the
  *    politeness-bound rate, on a deterministic multi-host synthetic
  *    web at the session's parallelism. Scaling efficiency is evidenced
  *    separately by `tools/scaling.sh` (one fresh JVM per parallelism
  *    leg, interleaved trials — BASELINE.md records the results).
  */
object Bench {

  /** (stealTicks, totalTicks, busyTicks) from /proc/stat — lets every
    * measured pass RECORD how much the shared-VM host throttled it
    * (this box shows 0-30% steal in multi-minute windows; an efficiency
    * number without its steal context is meaningless here). */
  def cpuTicks(): (Long, Long, Long) = {
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      val f = try src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
              finally src.close()
      val total = f.sum
      val steal = if (f.length > 7) f(7) else 0L
      val idle = f(3) + (if (f.length > 4) f(4) else 0L)
      (steal, total, total - idle - steal)
    } catch { case _: Throwable => (0L, 1L, 0L) }
  }

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  /** Cumulative CPU seconds consumed by THIS JVM (driver + local
    * executors share the process under local[n]). 0.0 if the platform
    * bean is unavailable. */
  private def ownCpuSeconds(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        val t = os.getProcessCpuTime
        if (t < 0) 0.0 else t / 1e9
      case _ => 0.0
    }

  /** Whole-machine logical CPU count from /proc/stat (NOT
    * availableProcessors, which reports the taskset-restricted affinity
    * on the scaling legs — /proc/stat busy ticks always span the whole
    * machine, so the own-CPU share must be normalized the same way). */
  private lazy val machineCpus: Int = {
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().count(l => l.startsWith("cpu") && l != "cpu" &&
        l.charAt(3).isDigit)
      finally src.close()
    } catch { case _: Throwable => Runtime.getRuntime.availableProcessors }
  }

  /** [[timedWithSteal]] plus the window's FOREIGN-CPU share — machine
    * busy ticks minus this JVM's own CPU time, as a % of whole-machine
    * capacity. Co-tenant contention shows ~0% /proc/stat steal while
    * degrading a window 2-3×; this is the signal that catches it.
    * Returns (result, sec, stealPct, busyPct, gcSec, foreignPct). */
  def timedWithStealForeign[A](body: => A): (A, Double, Double, Double, Double, Double) = {
    val o0 = ownCpuSeconds()
    val (r, sec, steal, busy, gc) = timedWithSteal(body)
    val ownPct =
      if (sec <= 0) 0.0
      else 100.0 * (ownCpuSeconds() - o0) / (sec * machineCpus)
    (r, sec, steal, busy, gc, math.max(0.0, busy - ownPct))
  }

  /** Achieved memory-copy bandwidth (GB/s) of a ~200 ms probe: timed
    * arraycopy passes over a preallocated 256 MiB long array. The
    * third contention signal: a NEIGHBOR VM saturating the socket's
    * memory bandwidth is invisible to BOTH /proc/stat steal and the
    * foreign-CPU share (observed: crawl/CC legs 30-60% slow in a
    * window with 0.5% steal and 0.0% foreign CPU) — this probe
    * measures the resource those shuffle-heavy legs actually starve
    * on. Single-threaded by design: the probe runs between sections
    * when our own executors are idle, so its achieved rate reflects
    * what the socket has left over. */
  private lazy val bwSrc = new Array[Long](32 << 20) // 256 MiB
  private lazy val bwDst = new Array[Long](32 << 20)
  def memBwProbe(): Double = {
    System.arraycopy(bwSrc, 0, bwDst, 0, bwSrc.length) // alloc+JIT warm
    val reps = 4
    val t0 = System.nanoTime()
    var i = 0
    while (i < reps) { System.arraycopy(bwSrc, 0, bwDst, 0, bwSrc.length); i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    reps * 2.0 * 8 * bwSrc.length / sec / 1e9 // read+write bytes moved
  }

  /** Best probe bandwidth seen in this JVM — the "what this box can do
    * in a clean window" reference the gate compares against. Carries
    * across sections, so a leg late in the bench is judged against the
    * clean windows the early legs saw. */
  @volatile private var peakMemBw = 0.0

  /** Run `body`, returning (result, seconds, stealPct, busyPct, gcSec). */
  def timedWithSteal[A](body: => A): (A, Double, Double, Double, Double) = {
    val (s0, t0, b0) = cpuTicks()
    val g0 = gcMillis()
    val n0 = System.nanoTime()
    val r = body
    val sec = (System.nanoTime() - n0) / 1e9
    val g1 = gcMillis()
    val (s1, t1, b1) = cpuTicks()
    val dt = math.max(1L, t1 - t0).toDouble
    (r, sec, 100.0 * (s1 - s0) / dt, 100.0 * (b1 - b0) / dt, (g1 - g0) / 1e3)
  }

  /** Steal-gate a bench section so the COMMITTED artifact carries a
    * defensible number: this box is a shared VM whose host throttles in
    * multi-minute windows (steal spikes to ~30-40%), and a section
    * measured inside one reports 2-4× degraded throughput that reads as
    * a code regression round-over-round. Re-run the section while its
    * measurement window shows > `thresholdPct` steal (up to `maxTries`),
    * keep the try with the best `primary` metric, and record the kept
    * try's steal + the try count — the artifact then defends its own
    * context instead of needing side evidence. Sections that track
    * their own per-pass steal (key `<name>_steal_pct`) are gated on
    * that; others on the whole-window /proc/stat delta.
    *
    * Steal alone is not enough on this box: a CO-TENANT PROCESS eating
    * the cores shows 0% steal yet degrades throughput just as badly
    * (observed: 0.2% steal, 2.8× slow). So each window also measures
    * the FOREIGN-CPU share — machine busy ticks minus this JVM's own
    * CPU time, as a % of the window's whole-machine CPU capacity.
    * And CPU signals alone still miss a neighbor saturating MEMORY
    * BANDWIDTH (observed: 0.5% steal, 0.0% foreign, crawl 31% slow),
    * so each window is bracketed by [[memBwProbe]] and the window's
    * min probe is compared against the best this JVM has seen
    * ([[peakMemBw]]). The window is "clean" only when all three
    * signals pass; the kept try records all three. */
  def retryOnSteal(name: String, primary: String, maxTries: Int,
      thresholdPct: Double = 5.0,
      foreignThresholdPct: Double = 10.0,
      memBwFrac: Double = 0.7)(section: => Map[String, Double]): Map[String, Double] = {
    var best: Map[String, Double] = null
    var bestSteal = 0.0
    var bestForeign = 0.0
    var bestBw = 0.0
    var bestGc = 0.0
    var tries = 0
    var clean = false
    while (tries < maxTries && !clean) {
      val bw0 = memBwProbe()
      val (m, _, windowSteal, _, gcSec, foreignPct) = timedWithStealForeign(section)
      val bw = math.min(bw0, memBwProbe())
      if (bw > peakMemBw) peakMemBw = bw
      val steal = m.getOrElse(s"${name}_steal_pct", windowSteal)
      tries += 1
      if (best == null || m(primary) > best(primary)) {
        best = m; bestSteal = steal; bestForeign = foreignPct; bestBw = bw
        bestGc = gcSec
      }
      clean = steal <= thresholdPct && foreignPct <= foreignThresholdPct &&
        bw >= memBwFrac * peakMemBw
    }
    best ++ Map(
      s"${name}_kept_steal_pct" -> bestSteal,
      s"${name}_kept_foreign_cpu_pct" -> bestForeign,
      s"${name}_kept_mem_bw_gbs" -> bestBw,
      // GC seconds inside the kept window: separates "the box was
      // contended" from "our own heap churned" when a leg reads slow
      s"${name}_kept_gc_sec" -> bestGc,
      s"${name}_tries" -> tries.toDouble)
  }

  /** Fresh temp dir for a bench leg's synthetic inputs, deleted in a
    * finally — the 10^8/10^9-doc legs would otherwise strand tens of GB
    * of parquet in /tmp per probe run. */
  private def withTempDir[A](prefix: String)(body: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    try body(dir.toString)
    finally {
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) { w =>
        w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      }
    }
  }

  /** Accumulates executor shuffle bytes written across completed stages
    * — a STEAL-PROOF unit for comparing dedup paths (host throttling
    * stretches seconds but cannot change how many bytes a plan moves). */
  private final class ShuffleBytesListener extends org.apache.spark.scheduler.SparkListener {
    val written = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      written.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      ()
    }
    /** Listener events are delivered async; poll until the counter is
      * quiet so a snapshot covers the job that just finished. */
    def settled(): Long = {
      var prev = -1L
      var v = written.get()
      var waited = 0
      while (v != prev && waited < 2000) {
        prev = v; Thread.sleep(100); waited += 100; v = written.get()
      }
      v
    }
  }

  def crawlBench(spark: SparkSession, nCats: Int, nHosts: Int): Map[String, Double] =
    withTempDir("graftbench")(dir => crawlBenchIn(spark, nCats, nHosts, dir))

  private def crawlBenchIn(
      spark: SparkSession, nCats: Int, nHosts: Int, dir: String): Map[String, Double] = {
    val spec = WebSpec(
      nCats = nCats, nArticles = nCats * 2, nHosts = nHosts,
      branching = 4, articlesPerCat = 4, nSeeds = math.max(nHosts, 4),
      withBlocked = false)
    val store = new PageStore(spec)
    // saltFactor 16: the BFS web has only `nHosts` hosts, so the fetch
    // partition key space is nHosts × salt cells — 32×4=128 cells over
    // 32 partitions leaves a ~2× max/mean Poisson imbalance; 512 cells
    // balance to ±10%. Politeness is off here, so salt only affects
    // balance (each host still co-locates per slice when pacing is on).
    val cfg = CrawlConfig(workDir = dir, blockedUrls = Set.empty, useBloom = true,
      saltFactor = 16)
    val engine = new FrontierEngine(spark, store, cfg)
    val t0 = System.nanoTime()
    engine.run()
    val crawlSec = (System.nanoTime() - t0) / 1e9
    val fetched = engine.crawledCount()
    val frontierRows = engine.frontier.read().count()
    val seenN = engine.seenSet().count()

    // leaf stage throughput (parse-dominated) — measured with
    // fidelityF4=false (crawled-check on (host, title)): this bench web
    // reuses each article title across its 32 hosts, so the reference's
    // title-only quirk would collapse ~97% of the work list (r3
    // measured 39k docs where r2's pre-quirk build parsed 695k) and
    // make leaf numbers incomparable round-over-round. The faithful
    // mode stays spec-pinned in LeafPipelineSpec; BASELINE.md records
    // the mode measured here.
    val lp = new LeafPipeline(spark, store, cfg.copy(fidelityF4 = false))
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
      "leaf_docs_per_sec" -> (if (leafSec > 0) parsed / leafSec else 0.0),
      "leaf_f4_faithful" -> 0.0 // 0 = measured with fidelityF4=false
    )
  }

  /** Sustained fetch+parse STAGE throughput — the number that scales
    * with executors. At the 10^10 design point a superstep holds
    * millions of URLs, so the per-superstep orchestration (queue
    * commits, seq assignment) amortizes to noise and the sustained
    * fetched-URLs/sec IS this stage rate. Measured over one large
    * salted-repartition → mapPartitions(fetch) → extract → count pass
    * on `nUrls` category pages across 32 hosts, politeness off. */
  def stageBench(spark: SparkSession, nUrls: Int, nHosts: Int = 256): Map[String, Double] = {
    import spark.implicits._
    // nHosts matters for SCALING: the fetch stage partitions by
    // (host, slice), so the key space is nHosts × saltFactor. With only
    // 32 hosts (128 keys over 32 partitions) Poisson key placement makes
    // the max partition ~2× the mean and caps speedup at ~2.3× for 4×
    // cores (measured r2). A realistic web has hosts >> partitions —
    // 256 hosts × 4 slices = 1024 keys balances to ~1.1× max/mean.
    val spec = WebSpec(nCats = nUrls, nArticles = 1000, nHosts = nHosts,
      branching = 4, articlesPerCat = 4, withBlocked = false)
    val store = new PageStore(spec)
    // single task wave (nPart == cores): 4-wave packing was measured
    // r2 and did NOT improve utilization (74.6% vs 76.5% busy at 32) —
    // the balanced (host,slice) key already packs a single wave to ±3%
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val urls = spark.range(nUrls)
      .select(col("id"))
      .as[Long]
      .map(i => (s"https://host${i % nHosts}.graft.example/wiki/Category:K$i", i))
      .toDF("url", "seq")
    val salted = urls
      .repartition(nPart, FrontierEngine.saltedPartitionKey(col("url"), 4))
      .as[(String, Long)]
    val fetchFn = FrontierEngine.politeFetch(store, RobotsPolicy.allowAll, 0.0, 4) _
    def pass(ds: org.apache.spark.sql.Dataset[(String, Long)]): Long = ds
      .mapPartitions(fetchFn)
      .filter(_._3.isDefined)
      .flatMap(r => FrontierEngine.extractLinks((r._1, r._2, r._3.get)))
      .count()
    // JIT warm-up (hot loops are 20-40x slower until C2-compiled), then
    // best-of-3 measured passes: this box is a shared VM with spiky
    // steal time, so single-pass numbers swing 2-4x. Each pass records
    // its own /proc/stat steal so the reported number carries its
    // host-interference context.
    pass(salted.limit(100000).as[(String, Long)])
    val runs = (1 to 3).map { _ =>
      timedWithStealForeign(pass(salted))
    }
    val (nLinks, sec, steal, busy, gcSec, foreign) = runs.minBy(_._2)
    Map(
      "stage_urls" -> nUrls.toDouble,
      "stage_sec" -> sec,
      "stage_urls_per_sec" -> nUrls / sec,
      "stage_links_per_sec" -> nLinks / sec,
      "stage_steal_pct" -> steal,
      "stage_busy_pct" -> busy,
      "stage_foreign_cpu_pct" -> foreign,
      "stage_gc_sec" -> gcSec
    )
  }

  /** Frontier dedup rate at the 10^7-row local design point (BASELINE
    * target: "frontier dedup rate on a 10^10-URL synthetic frontier" —
    * evidenced here at 10^7 with the cost model documented in
    * BASELINE.md). Builds an nSeen-row seen table ON PARQUET (the real
    * superstep reads committed state, not cached DataFrames), a
    * candidate batch with ~50% true duplicates, and measures the
    * engine's actual dedup operator — the bloom-prefiltered exact
    * anti-join — against the plain exact anti-join. */
  def dedupBench(spark: SparkSession, nSeen: Int, nCand: Int): Map[String, Double] =
    withTempDir("graftdedup")(dir => dedupBenchIn(spark, nSeen, nCand, dir))

  private def dedupBenchIn(
      spark: SparkSession, nSeen: Int, nCand: Int, dir: String): Map[String, Double] = {
    import spark.implicits._
    val url = (idCol: org.apache.spark.sql.Column) =>
      concat(lit("https://host"), pmod(idCol, lit(997)), lit(".graft.example/wiki/A"), idCol)
    spark.range(nSeen.toLong).select(url(col("id")).as("url"))
      .repartition(8).write.parquet(s"$dir/seen")
    val seen = spark.read.parquet(s"$dir/seen")
    // candidates: ids in [nSeen/2, nSeen/2 + nCand) → ~50% already seen
    val cand = spark.range(nSeen / 2L, nSeen / 2L + nCand)
      .select(url(col("id")).as("url"))
    // monolith build: distributed partials DRIVER-MERGED (the legacy
    // path — its build cost and driver residency are what the sharded
    // store removes)
    val (bloom, bloomBuildSec, _, _, _) =
      timedWithSteal(seen.stat.bloomFilter("url", nSeen.toLong, 0.01))
    // sharded build: 32 bucket-routed tasks each WRITE their own shard
    // file — nothing merges on the driver at any size
    val shardStore = new graft.tables.BloomShardStore(
      s"$dir/shards", buckets = 32, keys = Seq("url"))
    val (_, shardBuildSec, _, _, _) =
      timedWithSteal(shardStore.refresh(seen, v = 1,
        expectedItemsPerShard = math.max(1024L, nSeen / 32L)))
    // cuckoo shards: same store, other filter kind (north rule names
    // both). Measured at the standard rung only — the 10^9 rung's
    // disk/GC budget is sized for three paths.
    val cuckooStore = new graft.tables.BloomShardStore(
      s"$dir/cuckoo_shards", buckets = 32, keys = Seq("url"), kind = "cuckoo")
    val cuckooBuildSec =
      if (nSeen >= 100000000) 0.0
      else timedWithSteal(cuckooStore.refresh(seen, v = 1,
        expectedItemsPerShard = math.max(1024L, nSeen / 32L)))._2

    // shuffle BYTES are the steal-proof comparison unit: wall seconds
    // under host throttling can invert the exact-vs-bloom verdict (seen
    // in committed r2 artifacts), but the bytes a plan shuffles are a
    // property of the plan, not the window
    val listener = new ShuffleBytesListener
    spark.sparkContext.addSparkListener(listener)
    def measured(body: => Long): (Long, Double, Double, Long) = {
      val w0 = listener.settled()
      val (n, sec, steal, _, _) = timedWithSteal(body)
      (n, sec, steal, listener.settled() - w0)
    }
    def exactBody: Long = cand.join(seen, Seq("url"), "left_anti").count()
    def bloomBody: Long =
      FrontierEngine.antiJoinWithBloom(spark, cand, seen, Seq("url"),
        Some(FrontierEngine.mightContainCol(spark, bloom, Seq("url")))).count()
    def shardBody: Long =
      FrontierEngine.antiJoinWithBloom(spark, cand, seen, Seq("url"),
        Some(shardStore.probeCol(Seq(col("url"))))).count()
    def cuckooBody: Long =
      FrontierEngine.antiJoinWithBloom(spark, cand, seen, Seq("url"),
        Some(cuckooStore.probeCol(Seq(col("url"))))).count()
    // warm-up (JIT + parquet footer cache), then INTERLEAVED trials per
    // path: interleaving means a throttle window degrades all paths
    // rather than silently biasing whichever ran inside it. At the
    // 10^9 ladder point each anti-join spills tens of GB of shuffle
    // files that outlive the job (cleaned only on GC), so trials drop
    // to 1 and the warm-up is skipped — the artifact records the
    // trial count, and the per-pass steal field carries the context a
    // best-of-N would otherwise provide.
    // 15 accumulated joins OOM'd the 48g heap at 10^8 (r4 measured)
    // where r3's 10 fit — the 10^8+ points run one trial per path
    val huge = nSeen >= 100000000
    val nTrials = if (huge) 1 else 5
    if (!huge) { exactBody; bloomBody; shardBody; cuckooBody }
    // at the huge points, force a driver GC between paths: shuffle
    // files are removed by the async ContextCleaner only when their
    // dependency objects are collected, and three accumulated 10^9
    // spill sets otherwise exceed the box's free disk
    def gcIfHuge(): Unit = if (huge) { System.gc(); Thread.sleep(3000) }
    val trials = (1 to nTrials).map { _ =>
      val e = measured(exactBody); gcIfHuge()
      val b = measured(bloomBody); gcIfHuge()
      val s = measured(shardBody); gcIfHuge()
      val c = if (huge) (0L, 0.0, 0.0, 0L) else measured(cuckooBody)
      (e, b, s, c)
    }
    val (nExact, exactSec, exactSteal, exactBytes) = trials.map(_._1).minBy(_._2)
    val (nBloom, bloomSec, bloomSteal, bloomBytes) = trials.map(_._2).minBy(_._2)
    val (nShard, shardSec, shardSteal, shardBytes) = trials.map(_._3).minBy(_._2)
    val (nCuckoo, cuckooSec, cuckooSteal, cuckooBytes) = trials.map(_._4).minBy(_._2)
    spark.sparkContext.removeSparkListener(listener)
    require(nExact == nBloom, s"bloom path changed the result: $nExact vs $nBloom")
    require(nExact == nShard, s"shard path changed the result: $nExact vs $nShard")
    require(huge || nExact == nCuckoo,
      s"cuckoo path changed the result: $nExact vs $nCuckoo")
    Map(
      "dedup_seen_rows" -> nSeen.toDouble,
      "dedup_cand_rows" -> nCand.toDouble,
      "dedup_trials_per_path" -> trials.length.toDouble,
      "dedup_exact_sec" -> exactSec,
      "dedup_exact_rows_per_sec" -> nCand / exactSec,
      "dedup_exact_shuffle_mb" -> exactBytes / 1e6,
      "dedup_bloom_sec" -> bloomSec,
      "dedup_bloom_rows_per_sec" -> nCand / bloomSec,
      "dedup_bloom_shuffle_mb" -> bloomBytes / 1e6,
      "dedup_bloom_build_sec" -> bloomBuildSec,
      "dedup_shard_sec" -> shardSec,
      "dedup_shard_rows_per_sec" -> nCand / shardSec,
      "dedup_shard_shuffle_mb" -> shardBytes / 1e6,
      "dedup_shard_build_sec" -> shardBuildSec,
      "dedup_steal_pct" -> math.max(exactSteal, math.max(bloomSteal, shardSteal)),
      "dedup_unseen_rows" -> nExact.toDouble
    ) ++ (if (huge) Map.empty[String, Double] else Map(
      "dedup_cuckoo_sec" -> cuckooSec,
      "dedup_cuckoo_rows_per_sec" -> nCand / cuckooSec,
      "dedup_cuckoo_shuffle_mb" -> cuckooBytes / 1e6,
      "dedup_cuckoo_build_sec" -> cuckooBuildSec,
      "dedup_cuckoo_steal_pct" -> cuckooSteal))
  }

  /** Candidate-volume evidence for the prefix-filtered Jaccard join
    * (deterministic counts — steal can't touch them): join-row volume
    * of the naive inverted-index self-join (Σ_s C(df_s,2), the pair
    * blow-up a hot shingle causes) vs the same formula over the
    * frequency-ordered prefixes actually indexed, plus the surviving
    * candidate pairs. */
  /** Text-dedup / corpus-build scale probe (StageProbe mode
    * `textdedup`, not part of the per-round bench): the minhash family
    * measured at corpus sizes the sf tables can't reach. Synthetic
    * clustered docs — 4 docs per cluster sharing an 11-word
    * cluster-namespaced tail plus one per-doc word, with a 5-stopword
    * head so the corpus-build gates pass — written to parquet first so
    * every leg reads a real scan. Three legs:
    *  1. index build: `minhashBandRows` over the corpus → parquet (the
    *     persisted signature index; shingle+md5+min-agg dominated);
    *  2. incremental batch: 1% new docs (near-dups of existing
    *     clusters) joined against the STORED index — the continual
    *     ingest shape; corpus is read, never re-shingled;
    *  3. corpus_build end-to-end (gates → window dedup → decontaminate
    *     → split) over the same corpus.
    */
  def textDedupBench(spark: SparkSession, nDocs: Long): Map[String, Double] =
    withTempDir("grafttd")(dir => textDedupBenchIn(spark, nDocs, dir))

  /** INDEX-BACKED streaming-curation scale probe (StageProbe mode
    * `curation`): ingest `nBatches` micro-batches into a
    * [[graft.streaming.CuratedCorpus]] and pin the O(batch) claim with
    * MEASURED per-batch cost — wall seconds AND corpus-side scanned
    * bytes (the executed probe stats ProbedKeyIndex returns) — for
    * EARLY batches vs LATE batches, while the curated table grows
    * `nBatches`×. If per-batch cost is O(batch), the late/early ratios
    * sit near 1; under the rescan baseline they grow with the corpus.
    * The contrast leg (`withBaseline`) runs the SAME batches through
    * `CurationStream.curateBatch` — the O(corpus)-rescan semantic
    * baseline (exact dedup only, no near-dup: strictly LESS work per
    * batch than the indexed path, so any growth it shows is pure
    * rescan cost, not extra features).
    *
    * Batch shape (deterministic): batch b = doc_ids [b·S, (b+1)·S);
    * role = id % 10 → role 0 = EXACT dup of a unique doc one batch
    * back, role 1 = NEAR dup (same 11-word tail, different variant
    * word) of a unique doc one batch back, other roles unique. Every
    * batch after the first thus carries exactly 10% cross-batch exact
    * dups (the in-artifact anchor: exact drops must equal
    * (nBatches−1)·S/10) and 10% cross-batch near dups — the indexes do
    * real probe work every batch. */
  def curationBench(spark: SparkSession, nDocs: Long, nBatches: Int,
      withBaseline: Boolean, dupPeriod: Int = 10,
      targetPartKb: Long = 0): Map[String, Double] =
    withTempDir("graftcur")(dir =>
      curationBenchIn(spark, nDocs, nBatches, withBaseline, dupPeriod,
        targetPartKb, dir))

  /** `dupPeriod` sets the planted duplicate density (one exact + one
    * near dup per `dupPeriod` docs — 10 = the saturated regime where
    * every bucket holds a candidate, 1000+ = the sparse regime where
    * partition pruning shows). `targetPartKb` > 0 turns on adaptive
    * index re-bucketing (ProbedKeyIndex.targetPartitionBytes): mirror
    * partitions stay ≈ that size as the corpus grows, so sparse-regime
    * probe bytes stay under the candidateKeys × partition-size ceiling
    * instead of growing with the corpus. */
  private def curationBenchIn(spark: SparkSession, nDocs: Long, nBatches: Int,
      withBaseline: Boolean, dupPeriod: Int, targetPartKb: Long,
      dir: String): Map[String, Double] = {
    import org.apache.spark.sql.functions.concat_ws
    // batch size: multiple of dupPeriod so role = id % dupPeriod is
    // batch-aligned (dup targets land exactly one batch back)
    val p = dupPeriod.toLong
    val s = math.max(p, nDocs / nBatches / p * p)
    val total = s * nBatches
    val role = pmod(col("id"), lit(dupPeriod))
    val inLater = col("id") >= s
    val isExact = inLater && (role === 0)
    val isNear = inLater && (role === 1)
    // both dup kinds target UNIQUE role-5 docs one batch back
    // (s % p == 0 keeps roles batch-aligned): a role-0 id targets
    // id-s+5 and the adjacent role-1 id targets (id+1)-s+4 — the SAME
    // role-5 doc, which is fine: the exact dup probes the hash index,
    // the near dup probes the band index, independently
    val exactTgt = col("id") - s + 5
    val nearTgt = col("id") - s + 4
    val cluster = when(isExact, exactTgt).when(isNear, nearTgt).otherwise(col("id"))
    val varId = when(isExact, exactTgt).otherwise(col("id"))
    val stop = Seq("the", "a", "of", "and", "to")
    val words = (1 to 11).flatMap { j =>
      val cw = concat(lit("c"), cluster.cast("long"), lit(s"w$j"))
      if (j <= stop.length) Seq(lit(stop(j - 1)), cw) else Seq(cw)
    } :+ concat(lit("var"), varId.cast("long"))
    spark.range(total)
      .select(col("id").as("doc_id"), concat_ws(" ", words: _*).as("text"),
        (col("id") / s).cast("int").as("batch"))
      .repartition(32).write.partitionBy("batch").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    def batchOf(b: Int) = docs.filter(col("batch") === b).select("doc_id", "text")

    // refresh threshold ≈ 3 batches of appended index delta (~80 B/doc
    // across hash + band rows), so compactions recur but most batches
    // are pure probes: compaction is the amortized LSM rewrite,
    // measured separately from probe cost below
    val cc = new graft.streaming.CuratedCorpus(spark, s"$dir/cur",
      minTokens = 3, minQuality = 0.0,
      refreshDeltaBytes = math.max(1L << 20, s * 240),
      targetIndexPartitionBytes = targetPartKb * 1024,
      // sparse regime: FP candidates must not relight every bucket
      indexFpp = if (targetPartKb > 0) 1e-5 else 0.001)
    val secs = new Array[Double](nBatches)
    val bytes = new Array[Double](nBatches)
    val mirrorScanned = new Array[Double](nBatches)
    val mirrorTotals = new Array[Double](nBatches)
    val candKeys = new Array[Double](nBatches)
    val genBuckets = new Array[Double](nBatches)
    val refreshedAt = new Array[Boolean](nBatches)
    var exactDropped = 0L
    var nearDropped = 0L
    var appended = 0L
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      val bt0 = System.nanoTime()
      val r = cc.curateBatch(batchOf(b), b.toLong)
      secs(b) = (System.nanoTime() - bt0) / 1e9
      bytes(b) = (r.hashStats.mirrorBytesScanned + r.hashStats.deltaBytesScanned +
        r.bandStats.mirrorBytesScanned + r.bandStats.deltaBytesScanned).toDouble
      mirrorScanned(b) = (r.hashStats.mirrorBytesScanned + r.bandStats.mirrorBytesScanned).toDouble
      mirrorTotals(b) = (r.hashStats.mirrorBytesTotal + r.bandStats.mirrorBytesTotal).toDouble
      candKeys(b) = (r.hashStats.candidateRows + r.bandStats.candidateRows).toDouble
      genBuckets(b) = math.max(r.hashStats.generationBuckets, r.bandStats.generationBuckets).toDouble
      refreshedAt(b) = r.refreshed
      exactDropped += r.exactDropped
      nearDropped += r.nearDupDropped
      appended += r.appendedRows
    }
    val ingestSec = (System.nanoTime() - t0) / 1e9
    val refreshes = refreshedAt.count(identity)
    // early/late PROBE cost excludes compaction batches (amortized
    // rewrite, reported separately) and batch 0 (JVM warm-up + empty
    // indexes): flat late/early = the O(batch) evidence
    def mean(a: Seq[Double]): Double = if (a.isEmpty) 0.0 else a.sum / a.size
    val probeIdx = (1 until nBatches).filterNot(refreshedAt)
    val earlyIdx = probeIdx.take(3)
    val lateIdx = probeIdx.takeRight(3)
    val earlySec = mean(earlyIdx.map(secs))
    val lateSec = mean(lateIdx.map(secs))
    val earlyBytes = mean(earlyIdx.map(bytes))
    val lateBytes = mean(lateIdx.map(bytes))
    val refreshSec = mean((0 until nBatches).filter(refreshedAt).map(secs))

    val baseline: Map[String, Double] =
      if (!withBaseline) Map.empty
      else {
        val table = new graft.tables.IceLite(spark, s"$dir/base")
        val bsecs = new Array[Double](nBatches)
        val bt = System.nanoTime()
        (0 until nBatches).foreach { b =>
          val t = System.nanoTime()
          graft.streaming.CurationStream.curateBatch(
            table, batchOf(b), b.toLong, minTokens = 3, minQuality = 0.0)
          bsecs(b) = (System.nanoTime() - t) / 1e9
        }
        Map(
          "cur_baseline_sec" -> (System.nanoTime() - bt) / 1e9,
          "cur_baseline_early_batch_sec" -> mean(bsecs.slice(1, 4)),
          "cur_baseline_late_batch_sec" -> mean(bsecs.takeRight(3)),
          "cur_baseline_late_over_early_sec" ->
            mean(bsecs.takeRight(3)) / math.max(1e-9, mean(bsecs.slice(1, 4))))
      }
    val lateMirrorTotal = mean(lateIdx.map(mirrorTotals))
    val lateCand = mean(lateIdx.map(candKeys))
    // the O(batch) ceiling: candidate keys × fixed partition bytes
    val obound =
      if (targetPartKb > 0) Map(
        "cur_late_obatch_bound_mb" -> lateCand * targetPartKb * 1024 / 1e6,
        "cur_late_buckets" -> mean(lateIdx.map(genBuckets)),
        "cur_early_buckets" -> mean(earlyIdx.map(genBuckets)))
      else Map.empty[String, Double]
    Map(
      "cur_docs" -> total.toDouble,
      "cur_batches" -> nBatches.toDouble,
      "cur_batch_docs" -> s.toDouble,
      "cur_dup_period" -> dupPeriod.toDouble,
      "cur_late_cand_keys" -> lateCand,
      "cur_late_mirror_total_mb" -> lateMirrorTotal / 1e6,
      "cur_late_mirror_scanned_mb" -> mean(lateIdx.map(mirrorScanned)) / 1e6,
      "cur_late_delta_scanned_mb" ->
        (mean(lateIdx.map(bytes)) - mean(lateIdx.map(mirrorScanned))) / 1e6,
      "cur_late_scanned_frac" ->
        (if (lateMirrorTotal > 0) mean(lateIdx.map(mirrorScanned)) / lateMirrorTotal
         else -1.0),
      "cur_ingest_sec" -> ingestSec,
      "cur_docs_per_sec" -> total / ingestSec,
      "cur_appended" -> appended.toDouble,
      "cur_exact_dropped" -> exactDropped.toDouble,
      "cur_exact_dropped_expected" -> ((nBatches - 1).toLong * s / p).toDouble,
      "cur_neardup_dropped" -> nearDropped.toDouble,
      "cur_refreshes" -> refreshes.toDouble,
      "cur_refresh_batch_sec" -> refreshSec,
      "cur_early_batch_sec" -> earlySec,
      "cur_late_batch_sec" -> lateSec,
      "cur_late_over_early_sec" -> lateSec / math.max(1e-9, earlySec),
      "cur_early_batch_scanned_mb" -> earlyBytes / 1e6,
      "cur_late_batch_scanned_mb" -> lateBytes / 1e6,
      "cur_late_over_early_scanned" ->
        (if (earlyBytes > 0) lateBytes / earlyBytes else -1.0)
    ) ++ obound ++ baseline
  }

  /** NEAR-dup corpus-build scale probe (StageProbe mode `cnd`): the
    * full corpusBuildNearDup pipeline — gates → exact dedup →
    * decontaminate → split → LSH pairs → connected components → one
    * keeper per cluster — at ladder scale, with its in-artifact
    * correctness anchors: survivor fraction (stable across rungs ⇒ the
    * pipeline composes scale-invariantly), component-round count (the
    * O(log n) convergence evidence), and the decontamination
    * PROBE-ROW comparison (keepers-only vs pre-dedup — the r5 fix that
    * skips redundant shingle probes on dup-heavy corpora).
    *
    * Synthetic corpus: clusters of 4 near-dup docs (shared 11-word
    * tail, per-PAIR variant word) where each cluster's docs form 2
    * exact-dup pairs — so exact dedup halves the corpus and near-dup
    * resolution halves the survivors again (expected survivor fraction
    * ≈ 25% of gated docs, minus decontamination/benchmark slices). */
  def corpusNearDupBench(spark: SparkSession, nDocs: Long): Map[String, Double] =
    withTempDir("graftcnd")(dir => corpusNearDupBenchIn(spark, nDocs, dir))

  private def corpusNearDupBenchIn(
      spark: SparkSession, nDocs: Long, dir: String): Map[String, Double] = {
    import org.apache.spark.sql.functions.concat_ws
    val stop = Seq("the", "a", "of", "and", "to")
    // cluster of 4 = ids [4k, 4k+3]; exact-dup pairs via var(id - id%2)
    val cluster = (col("id") / 4).cast("long")
    val words = (1 to 11).flatMap { j =>
      val cw = concat(lit("c"), cluster, lit(s"w$j"))
      if (j <= stop.length) Seq(lit(stop(j - 1)), cw) else Seq(cw)
    } :+ concat(lit("var"), (col("id") - pmod(col("id"), lit(2))).cast("long"))
    spark.range(nDocs)
      .select(col("id").as("doc_id"), concat_ws(" ", words: _*).as("text"))
      .repartition(32).write.parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")

    val ((survivors), sec, steal, _, _) = timedWithSteal {
      graft.ops.CorpusPipeline.corpusBuildNearDup(docs, minQuality = 0.2).count()
    }
    // stage decomposition for the round count (re-runs the pair +
    // component stages only — base is checkpointed once)
    val base = graft.ops.CorpusPipeline.corpusBuild(docs, minQuality = 0.2)
      .localCheckpoint()
    val survivorDocs = docs.join(base.select("doc_id"), Seq("doc_id"), "left_semi")
    val pairs = graft.ops.TextDedup.minhashCandidatePairs(survivorDocs)
      .select("doc_a", "doc_b").localCheckpoint()
    val nPairs = pairs.count()
    val (labels, rounds) =
      graft.ops.DedupGraph.connectedComponentsWithRounds(pairs)
    val nComponents = labels.select("component").distinct().count()
    // decontamination probe volume: shingle rows entering the broadcast
    // probe from KEEPERS (the r5 probe side) vs PRE-DEDUP (the r4 side)
    val toks = graft.ops.TextDedup.tokens(col("text"))
    val filtered = docs
      .filter(!graft.ops.CorpusPipeline.isBenchmark(2))
      .filter(org.apache.spark.sql.functions.size(toks) >= 10)
      .filter(graft.ops.TextAnalysis.qualityScore(toks) >= 0.2)
      .filter(graft.ops.TextAnalysis.bestLang(toks).getField("lang")
        .isin("en", "zh"))
    val deduped = filtered
      .withColumn("__keep", org.apache.spark.sql.functions.min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy(
          org.apache.spark.sql.functions.md5(col("text")))))
      .filter(col("doc_id") === col("__keep"))
    def probeRows(df: org.apache.spark.sql.DataFrame): Long = df
      .select(explode(graft.ops.TextDedup.shingles3(col("text"))).as("s"))
      .count()
    val probeKeepers = probeRows(deduped)
    val probePreDedup = probeRows(filtered)
    Map(
      "cnd_docs" -> nDocs.toDouble,
      "cnd_sec" -> sec,
      "cnd_docs_per_sec" -> nDocs / sec,
      "cnd_steal_pct" -> steal,
      "cnd_survivors" -> survivors.toDouble,
      "cnd_survivor_frac" -> survivors.toDouble / nDocs,
      "cnd_lsh_pairs" -> nPairs.toDouble,
      "cnd_components" -> nComponents.toDouble,
      "cnd_cc_rounds" -> rounds.toDouble,
      "cnd_decontam_probe_rows_keepers" -> probeKeepers.toDouble,
      "cnd_decontam_probe_rows_prededup" -> probePreDedup.toDouble,
      "cnd_decontam_probe_row_ratio" -> probePreDedup.toDouble / math.max(1L, probeKeepers))
  }

  /** Interleaved-record assembly scale probe (StageProbe mode `ix`):
    * synthetic corpus → spanize (north-rule span schema) → media-store
    * resolution → per-doc record assembly → fixed-budget packing,
    * steal-gated, with in-artifact correctness anchors: spans/doc must
    * equal the closed-form 20/3 (40 words → 5 chunks + {2,2,1} media
    * spans by doc_id%3), the missing-media fraction must sit near the
    * md5-tail 1/16 design point, and no packed sequence may exceed
    * budget + the largest single record. The assemble leg is the
    * at-scale shape: explode + one media equi-join + one
    * groupBy(doc_id) exchange. */
  def interleaveBench(spark: SparkSession, nDocs: Long): Map[String, Double] =
    withTempDir("graftix")(dir => interleaveBenchIn(spark, nDocs, dir))

  private def interleaveBenchIn(
      spark: SparkSession, nDocs: Long, dir: String): Map[String, Double] = {
    import org.apache.spark.sql.functions.concat_ws
    // 40 distinct-ish words per doc: varied moduli keep the text
    // non-degenerate without driver-side randomness
    val words = (1 to 40).map(j =>
      concat(lit(s"w$j"), pmod(col("id") * (j + 7), lit(97 + j))))
    spark.range(nDocs)
      .select(col("id").as("doc_id"), concat_ws(" ", words: _*).as("text"))
      .repartition(32).write.parquet(s"$dir/docs")
    // Size read splits to the corpus so small rungs still fan out to
    // every core: 32 files of a 10^6-doc corpus total ~50 MB, and the
    // default 128 MB maxPartitionBytes + 4 MB openCost packs them into
    // ~2 splits — the 10^6 rung then measures a 2-task scan (~29k
    // rows/s/task, same per-task rate as the 32-task 10^7 rung). At
    // 100 TB splits are abundant; a file-packing floor is a synthetic
    // artifact, not the operator's scaling. Scoped + restored.
    val prevMaxSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpenCost = spark.conf.get("spark.sql.files.openCostInBytes")
    val docBytes = new java.io.File(s"$dir/docs").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    spark.conf.set("spark.sql.files.maxPartitionBytes",
      math.max(1L << 20, docBytes / 32))
    spark.conf.set("spark.sql.files.openCostInBytes", 0L)
    try interleaveBenchLegs(spark, nDocs, dir)
    finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMaxSplit)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpenCost)
    }
  }

  private def interleaveBenchLegs(
      spark: SparkSession, nDocs: Long, dir: String): Map[String, Double] = {
    val docs = spark.read.parquet(s"$dir/docs")

    val flat = graft.ops.Interleave.spanizeFlat(docs)
    // UNTIMED warm-up at 1% scale: the first job of a fresh JVM pays
    // the Spark-jar page-cache + C2 compile of every codegen stage
    // (measured ~150-200 s charged to whichever leg runs first — the
    // ccBench cold-pass lesson); running the full pipeline shape once
    // small moves that cost out of the timed legs
    locally {
      val w = docs.limit(math.max(1000, (nDocs / 100).toInt))
      val wf = graft.ops.Interleave.spanizeFlat(w)
      graft.ops.Interleave
        .packManifest(graft.ops.Interleave.assemble(
          wf, graft.ops.Interleave.mediaStore(wf)), maxTokens = 512)
        .count()
      ()
    }
    // each leg steal-gated like the crawl/dedup sections: the shared
    // host throttles in multi-minute windows (observed 12-14% steal
    // windows turning the scan-side spanize leg 3× slow), so re-run a
    // dirty window and keep the best try with its steal recorded
    val spanizeLeg = retryOnSteal("ix_spanize", "ix_spanize_rows_per_sec", 3) {
      val (n, sec, steal, _, _) = timedWithSteal { flat.count() }
      Map("ix_spans" -> n.toDouble,
        "ix_spans_per_doc" -> n.toDouble / nDocs,
        "ix_spanize_sec" -> sec,
        "ix_spanize_rows_per_sec" -> n / sec,
        "ix_spanize_steal_pct" -> steal)
    }
    val assembleLeg = retryOnSteal("ix_assemble", "ix_assemble_docs_per_sec", 3) {
      val (recAgg, sec, steal, _, _) = timedWithSteal {
        graft.ops.Interleave
          .assemble(flat, graft.ops.Interleave.mediaStore(flat))
          .agg(count(lit(1)).as("n"), sum("n_media").as("media"),
            sum("n_missing").as("missing"), sum("total_tokens").as("toks"))
          .head()
      }
      Map("ix_records" -> recAgg.getLong(0).toDouble,
        "ix_media_spans" -> recAgg.getLong(1).toDouble,
        "ix_missing_frac" -> recAgg.getLong(2).toDouble / math.max(1L, recAgg.getLong(1)),
        "ix_total_tokens" -> recAgg.getLong(3).toDouble,
        "ix_assemble_sec" -> sec,
        "ix_assemble_steal_pct" -> steal,
        "ix_assemble_docs_per_sec" -> nDocs / sec)
    }
    val packLeg = retryOnSteal("ix_pack", "ix_pack_docs_per_sec", 3) {
      val (packAgg, sec, steal, _, _) = timedWithSteal {
        graft.ops.Interleave
          .packManifest(graft.ops.Interleave.assemble(
            flat, graft.ops.Interleave.mediaStore(flat)), maxTokens = 512)
          .agg(count(lit(1)).as("bins"), max("seq_tokens").as("maxSeq"))
          .head()
      }
      Map("ix_pack_bins" -> packAgg.getLong(0).toDouble,
        "ix_pack_max_seq_tokens" -> packAgg.getLong(1).toDouble,
        "ix_pack_sec" -> sec,
        "ix_pack_docs_per_sec" -> nDocs / sec,
        "ix_pack_steal_pct" -> steal)
    }
    Map("ix_docs" -> nDocs.toDouble) ++ spanizeLeg ++ assembleLeg ++ packLeg
  }

  private def textDedupBenchIn(
      spark: SparkSession, nDocs: Long, dir: String): Map[String, Double] = {
    import org.apache.spark.sql.functions.concat_ws
    def docsOf(ids: org.apache.spark.sql.DataFrame,
        docId: org.apache.spark.sql.Column,
        cluster: org.apache.spark.sql.Column) = {
      // stopwords INTERLEAVED with cluster words: every 3-shingle
      // contains a cluster-specific token, so no global shingle exists
      // (a constant stopword run would make every doc share "the a of"
      // with the benchmark slice and decontamination would flag the
      // whole corpus)
      val stop = Seq("the", "a", "of", "and", "to")
      val words = (1 to 11).flatMap { j =>
        val cw = concat(lit("c"), cluster, lit(s"w$j"))
        if (j <= stop.length) Seq(lit(stop(j - 1)), cw) else Seq(cw)
      } :+ concat(lit("var"), docId)
      ids.select(docId.as("doc_id"), concat_ws(" ", words: _*).as("text"))
    }
    docsOf(spark.range(nDocs).toDF("id"),
        col("id"), (col("id") / 4).cast("long"))
      .repartition(32).write.parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")

    // leg 1: build + persist the band-row index
    val (_, idxSec, idxSteal, _, _) = timedWithSteal {
      graft.ops.TextDedup.minhashBandRows(docs)
        .write.parquet(s"$dir/band_index")
    }
    val index = spark.read.parquet(s"$dir/band_index")

    // leg 2: 1% incremental batch — fresh doc_ids whose cluster tails
    // spread across the EXISTING clusters (each batch doc is a near-dup
    // of a stored cluster) — joined against the stored index
    val nBatch = math.max(1000L, nDocs / 100)
    val step = math.max(1L, nDocs / nBatch)
    val batch = docsOf(spark.range(nBatch).toDF("id"),
      col("id") + nDocs, ((col("id") * step) / 4).cast("long"))
    val (incPairs, incSec, incSteal, _, _) = timedWithSteal {
      graft.ops.TextDedup.incrementalMinhashPairs(batch, index).count()
    }

    // leg 3: corpus_build end-to-end (minQuality tuned to the synthetic
    // stopword ratio: 5/17 tokens → quality ≈ 0.232)
    val (survivors, cbSec, cbSteal, _, _) = timedWithSteal {
      graft.ops.CorpusPipeline.corpusBuild(docs, minQuality = 0.2).count()
    }
    Map(
      "td_docs" -> nDocs.toDouble,
      "td_index_sec" -> idxSec,
      "td_index_docs_per_sec" -> nDocs / idxSec,
      "td_index_steal_pct" -> idxSteal,
      "td_inc_batch_docs" -> nBatch.toDouble,
      "td_inc_sec" -> incSec,
      "td_inc_batch_docs_per_sec" -> nBatch / incSec,
      "td_inc_pairs" -> incPairs.toDouble,
      "td_inc_steal_pct" -> incSteal,
      "td_corpus_build_sec" -> cbSec,
      "td_corpus_build_docs_per_sec" -> nDocs / cbSec,
      "td_corpus_build_survivors" -> survivors.toDouble,
      "td_corpus_build_steal_pct" -> cbSteal)
  }

  def jaccardBench(spark: SparkSession, sfDir: String, threshold: Double = 0.8): Map[String, Double] = {
    import org.apache.spark.sql.functions.{count => fcount, sum}
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sh = docs.as[(Long, String)]
      .flatMap { case (id, t) =>
        graft.functions.TextKernels.shingles3(t).map(s => (id, s)) }
      .toDF("doc_id", "s")
    def joinRows(t: org.apache.spark.sql.DataFrame): Double =
      t.groupBy("s").agg(fcount(lit(1)).as("df"))
        .agg(sum(col("df") * (col("df") - 1) / 2)).as[Double].head()
    val naive = joinRows(sh)
    val prefix = joinRows(
      graft.ops.TextDedup.jaccardPrefixIndex(docs, threshold).select("doc_id", "s"))
    val candPairs = graft.ops.TextDedup.jaccardCandidatePairs(docs, threshold).count()
    Map(
      "jaccard_naive_join_rows" -> naive,
      "jaccard_prefix_join_rows" -> prefix,
      "jaccard_candidate_pairs" -> candPairs.toDouble
    )
  }

  /** ANN recall@k at bench scale: fraction of the brute-force top-k
    * neighbors each LSH variant recovers, averaged over the query set.
    * Deterministic counts — steal-proof — so the recall/cost dial of
    * the LSH path is pinned in the committed artifact, not just at the
    * toy scale of the unit specs.
    *
    * Each recall is reported NEXT TO the fraction of the candidate set
    * the variant actually scanned — recall alone is meaningless for a
    * pruning index (a random sample of the same size would score
    * candidate_frac by chance). The testdata embeddings are near-
    * uniform, the hardest case for hyperplane LSH: the honest headline
    * is the recall ÷ candidate-fraction lift, not the absolute. */
  def annRecallBench(spark: SparkSession, sfDir: String, k: Int = 5,
      nQueries: Int = 64): Map[String, Double] = {
    import graft.ops.Similarity
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count().toDouble
    val q = e.filter(col("vec_id") < nQueries)
    val brute = Similarity.bruteForceTopK(e, q, k)
      .select("query_id", "vec_id").persist()
    val denom = brute.count().toDouble
    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      brute.join(ann.select("query_id", "vec_id"),
        Seq("query_id", "vec_id"), "left_semi").count() / denom
    // candidate volume actually scanned by each variant: bucket-size
    // sums over the query buckets (minus the query itself for the
    // single-bucket probe)
    val sizes = e.select(Similarity.lshBucket(col("embedding"), 8).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("sz"))
    val qb = q.select(col("vec_id"), Similarity.lshBucket(col("embedding"), 8).as("bucket0"))
    val lshCand = qb.join(sizes, col("bucket0") === col("bucket"))
      .agg(org.apache.spark.sql.functions.sum(col("sz") - 1)).head().getLong(0).toDouble
    val probes = explode(array((0 to 8).map { i =>
      if (i == 0) col("bucket0") else col("bucket0").bitwiseXOR(lit(1 << (i - 1)))
    }: _*)).as("probe")
    val mpCand = qb.select(col("vec_id"), col("bucket0"), probes)
      .join(sizes, col("probe") === col("bucket"))
      .agg(org.apache.spark.sql.functions.sum(
        when(col("probe") === col("bucket0"), col("sz") - 1).otherwise(col("sz"))))
      .head().getLong(0).toDouble
    // multi-table / IVF candidate volume: a count over the shared
    // candidate-join DataFrames (column pruning drops the cos
    // projection, so this measures join volume only)
    val mtCand = Similarity.lshMultiTableCandidates(e, q).count().toDouble
    val ivfCand = Similarity.ivfCandidates(e, q).count().toDouble
    // fitted-pivot IVF (the shipping quantizer): same corpus, k-means
    // pivots instead of the oracle-pinned first-N rows
    val pivots = Similarity.fitIvfPivots(e, nCells = 32)
    val fitCand = Similarity.ivfCandidatesWith(pivots, e, q).count().toDouble
    val out = Map(
      s"ann_lsh_recall_at_$k" -> recall(Similarity.lshTopK(e, q, k)),
      s"ann_multiprobe_recall_at_$k" -> recall(Similarity.lshTopKMultiProbe(e, q, k)),
      s"ann_multitable_recall_at_$k" -> recall(Similarity.lshTopKMultiTable(e, q, k)),
      s"ann_ivf_recall_at_$k" -> recall(Similarity.ivfTopK(e, q, k)),
      s"ann_ivf_fitted_recall_at_$k" -> recall(Similarity.ivfTopKWith(pivots, e, q, k)),
      "ann_lsh_candidate_frac" -> lshCand / (nQueries * (n - 1)),
      "ann_multiprobe_candidate_frac" -> mpCand / (nQueries * (n - 1)),
      "ann_multitable_candidate_frac" -> mtCand / (nQueries * (n - 1)),
      "ann_ivf_candidate_frac" -> ivfCand / (nQueries * (n - 1)),
      "ann_ivf_fitted_candidate_frac" -> fitCand / (nQueries * (n - 1)),
      "ann_recall_queries" -> nQueries.toDouble)
    brute.unpersist()
    out
  }

  /** Cell-occupancy histogram of a cell assignment (collected counts
    * are ≤ nCells rows — metadata). Keys: `<prefix>_cells_occupied,
    * _cell_min, _cell_p50, _cell_p95, _cell_max, _cell_max_over_mean`. */
  private def occupancyStats(prefix: String,
      cells: org.apache.spark.sql.DataFrame): Map[String, Double] = {
    val sizes = cells.groupBy("cell").count()
      .select("count").collect().map(_.getLong(0)).sorted
    val tot = sizes.sum.toDouble
    def pct(p: Double): Double =
      sizes(math.min(sizes.length - 1, (p * sizes.length).toInt)).toDouble
    Map(
      s"${prefix}_cells_occupied" -> sizes.length.toDouble,
      s"${prefix}_cell_min" -> sizes.head.toDouble,
      s"${prefix}_cell_p50" -> pct(0.50),
      s"${prefix}_cell_p95" -> pct(0.95),
      s"${prefix}_cell_max" -> sizes.last.toDouble,
      s"${prefix}_cell_max_over_mean" -> sizes.last / (tot / sizes.length))
  }

  /** ANN recall in the DESIGN regime: real embedding corpora are
    * clustered, not isotropic — the testdata embeddings' top-5
    * neighbors sit at cos ≈ 0.37, where hyperplane LSH provably cannot
    * do better than its measured ~2-35% (0.62^planes per table). This
    * section generates a deterministic clustered corpus (nClusters
    * well-separated centers, 5% noise; in-cluster cos ≈ 0.99) fully
    * columnar — `sin`-based, no RNG, steal-proof — and reports the
    * same recall@k / candidate-fraction pairs there. Together the two
    * sections bound the operating envelope instead of cherry-picking
    * either regime. */
  def annClusteredRecallBench(spark: SparkSession, n: Int = 100000,
      nClusters: Int = 256, k: Int = 5, nQueries: Int = 64): Map[String, Double] = {
    import graft.ops.Similarity
    import org.apache.spark.sql.functions.{element_at, expr, sequence, sin, transform}
    val dims = 64
    val e = spark.range(n.toLong)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)), i =>
          (sin(pmod(col("id"), lit(nClusters)) * lit(101) + i * lit(13)) +
            lit(0.05) * sin(col("id") * lit(31) + i * lit(7))).cast("float"))
          .as("embedding"))
      .persist()
    e.count()
    val q = e.filter(col("vec_id") < nQueries)
    val brute = Similarity.bruteForceTopK(e, q, k)
      .select("query_id", "vec_id").persist()
    val denom = brute.count().toDouble
    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      brute.join(ann.select("query_id", "vec_id"),
        Seq("query_id", "vec_id"), "left_semi").count() / denom
    val mtCand = Similarity.lshMultiTableCandidates(e, q).count().toDouble
    val ivfCand = Similarity.ivfCandidates(e, q, nCells = nClusters).count().toDouble
    // the fitted quantizer in its design regime: k-means pivots track
    // the real cluster structure, so cells come out BALANCED (the
    // occupancy histogram is the point — first-N pivots on the same
    // corpus land several pivots in one cluster and zero in others)
    val pivots = Similarity.fitIvfPivots(e, nCells = nClusters)
    val fitCand = Similarity.ivfCandidatesWith(pivots, e, q).count().toDouble
    val out = Map(
      s"ann_clustered_multitable_recall_at_$k" ->
        recall(Similarity.lshTopKMultiTable(e, q, k)),
      s"ann_clustered_ivf_recall_at_$k" ->
        recall(Similarity.ivfTopK(e, q, k, nCells = nClusters)),
      s"ann_clustered_ivf_fitted_recall_at_$k" ->
        recall(Similarity.ivfTopKWith(pivots, e, q, k)),
      "ann_clustered_multitable_candidate_frac" -> mtCand / (nQueries.toDouble * (n - 1)),
      "ann_clustered_ivf_candidate_frac" -> ivfCand / (nQueries.toDouble * (n - 1)),
      "ann_clustered_ivf_fitted_candidate_frac" -> fitCand / (nQueries.toDouble * (n - 1)),
      "ann_clustered_rows" -> n.toDouble,
      "ann_clustered_clusters" -> nClusters.toDouble) ++
      occupancyStats("ann_clustered_ivf_fitted",
        graft.ops.Similarity.assignCellsWith(e, pivots)) ++
      occupancyStats("ann_clustered_ivf_firstn",
        graft.ops.Similarity.assignIvfCells(e, nClusters))
    brute.unpersist()
    e.unpersist()
    out ++ skewedPivotBench(spark, n, nClusters, k, nQueries)
  }

  /** The first-N pivot failure mode, measured: same clustered corpus
    * but with CONTIGUOUS cluster blocks (cluster = id / blockLen), so
    * the nClusters lowest vec_ids — the first-N pivot set — all sit in
    * cluster 0. First-N quantization then collapses (every row lands in
    * a near-identical pivot's cell chosen by noise; a query's probe
    * cells carry no signal), while the FITTED pivots come from a
    * hash-ordered sample that sees every cluster and stay balanced.
    * The id→cluster layout is metadata the quantizer cannot see, so a
    * robust quantizer must not depend on it — this section is the
    * in-artifact evidence fitIvfPivots closes that hole (recall AND
    * max/mean occupancy side by side). Queries: one per cluster block. */
  private def skewedPivotBench(spark: SparkSession, n: Int, nClusters: Int,
      k: Int, nQueries: Int): Map[String, Double] = {
    import graft.ops.Similarity
    import org.apache.spark.sql.functions.{sequence, sin, transform}
    val dims = 64
    val blockLen = n / nClusters
    val e = spark.range(n.toLong)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)), i =>
          (sin((col("id") / blockLen).cast("long") * lit(101) + i * lit(13)) +
            lit(0.05) * sin(col("id") * lit(31) + i * lit(7))).cast("float"))
          .as("embedding"))
      .persist()
    e.count()
    val q = e.filter(pmod(col("vec_id"), lit(n / nQueries)) === 0)
    val brute = Similarity.bruteForceTopK(e, q, k)
      .select("query_id", "vec_id").persist()
    val denom = brute.count().toDouble
    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      brute.join(ann.select("query_id", "vec_id"),
        Seq("query_id", "vec_id"), "left_semi").count() / denom
    val pivots = Similarity.fitIvfPivots(e, nCells = nClusters)
    val out = Map(
      s"ann_skewpivot_ivf_firstn_recall_at_$k" ->
        recall(Similarity.ivfTopK(e, q, k, nCells = nClusters)),
      s"ann_skewpivot_ivf_fitted_recall_at_$k" ->
        recall(Similarity.ivfTopKWith(pivots, e, q, k))) ++
      occupancyStats("ann_skewpivot_ivf_firstn",
        Similarity.assignIvfCells(e, nClusters)) ++
      occupancyStats("ann_skewpivot_ivf_fitted",
        Similarity.assignCellsWith(e, pivots))
    brute.unpersist()
    e.unpersist()
    out
  }

  /** Connected-components throughput at dedup-graph scale. The edge
    * set is `nEdges` edges laid out as disjoint CHAINS of `chainLen`
    * nodes — the adversarial shape for component finding (a chain of
    * length L needs ~log L star rounds; the hub/clique shapes real
    * near-dup graphs mostly contain converge in 2). Fully columnar
    * deterministic generation. Reports edges/sec, rounds to fixpoint
    * (the O(log n) convergence evidence), and the component count
    * found vs expected (an in-artifact correctness check at a scale
    * the oracle can't reach). */
  def ccBench(spark: SparkSession, nEdges: Int = 10000000,
      compLen: Int = 100, shape: String = "chain"): Map[String, Double] = {
    import graft.ops.DedupGraph
    val n = nEdges.toLong
    val p = s"cc_$shape"
    val edges = shape match {
      case "chain" => spark.range(n)
        .filter(pmod(col("id"), lit(compLen)) =!= (compLen - 1))
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      case "star" => spark.range(n)
        .filter(pmod(col("id"), lit(compLen)) =!= 0)
        .select(col("id").as("doc_a"),
          (col("id") - pmod(col("id"), lit(compLen))).as("doc_b"))
      case other => sys.error(s"ccBench: unknown shape $other")
    }
    val ((nEdgesReal, nComp, nNodes, rounds), sec, steal, _, _) = timedWithSteal {
      val ne = edges.count()
      val (labels, r) = DedupGraph.connectedComponentsWithRounds(edges)
      val agg = labels.agg(countDistinct("component"), count(lit(1))).first()
      (ne, agg.getLong(0), agg.getLong(1), r)
    }
    Map(
      s"${p}_edges" -> nEdgesReal.toDouble,
      s"${p}_edges_per_sec" -> nEdgesReal / sec,
      s"${p}_sec" -> sec,
      s"${p}_rounds" -> rounds.toDouble,
      s"${p}_comp_len" -> compLen.toDouble,
      s"${p}_components" -> nComp.toDouble,
      s"${p}_components_expected" -> math.ceil(n.toDouble / compLen),
      s"${p}_nodes" -> nNodes.toDouble,
      s"${p}_steal_pct" -> steal)
  }

  /** Politeness-bound fetch throughput — the BASELINE.json headline
    * condition ("under fixed politeness budget"). `nHosts` hosts each
    * capped at `rps` req/s: the ceiling is nHosts×rps and the engine's
    * job is to overlap the per-host pacing gaps across partitions.
    * Reports achieved rate and efficiency vs the ceiling. */
  def politeBench(spark: SparkSession, nUrls: Int, nHosts: Int, rps: Double): Map[String, Double] = {
    import spark.implicits._
    val spec = WebSpec(nCats = nUrls, nArticles = 1000, nHosts = nHosts,
      branching = 4, articlesPerCat = 4, withBlocked = false)
    val store = new PageStore(spec)
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val salt = 4
    val urls = spark.range(nUrls)
      .as[Long]
      .map(i => (s"https://host${i % nHosts}.graft.example/wiki/Category:K$i", i))
      .toDF("url", "seq")
      .repartition(nPart, FrontierEngine.saltedPartitionKey(col("url"), salt))
      .as[(String, Long)]
    val fetchFn = FrontierEngine.politeFetch(store, RobotsPolicy.allowAll, rps, salt) _
    val t0 = System.nanoTime()
    urls.mapPartitions(fetchFn).filter(_._3.isDefined).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val ceiling = nHosts * rps
    // the ACHIEVABLE floor is the largest pacing slice's quota (slice
    // populations are hash-Poisson, so the max slice, not the mean,
    // binds): floor_sec = (maxSliceCount - 1) × saltFactor / rps
    val maxSlice = urls
      .map { case (u, _) => (hostOf(u), FrontierEngine.sliceOf(u, salt)) }
      .groupByKey(identity).count().as[((String, Int), Long)]
      .map(_._2).reduce((a, b) => math.max(a, b))
    val floorSec = (maxSlice - 1) * salt / rps
    Map(
      "polite_urls" -> nUrls.toDouble,
      "polite_sec" -> sec,
      "polite_urls_per_sec" -> nUrls / sec,
      "polite_ceiling_urls_per_sec" -> ceiling,
      "polite_efficiency_vs_ceiling" -> (nUrls / sec) / ceiling,
      "polite_floor_sec" -> floorSec,
      "polite_efficiency_vs_floor" -> floorSec / sec
    )
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val crawlCats = sys.env.getOrElse("SPARK_GRAFT_BENCH_CATS", "20000").toInt
    val spark = Sessions.local(cpus, "graft-bench")

    // relational/pipeline queries: cold pass (counts as total), then a
    // measured warm pass per query. Forced via a checksum over every
    // output column — a bare count() lets Catalyst prune scan-side
    // projections to nothing and measures an empty scan.
    // checksum via bit_xor, NOT sum: Spark 4 runs ANSI mode by default
    // and summing uniform 64-bit hashes overflows almost surely, which
    // aborted the checksum's final stage early (swallowed by the catch
    // below) — r1/r2 per-query warm numbers under-measured the final
    // stage of every query because of exactly this. XOR cannot overflow
    // and still forces every row of every column.
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      import org.apache.spark.sql.functions.{struct, xxhash64, col, expr}
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      ()
    }
    // a failing query must be VISIBLE in the artifact, not a silently
    // fast timing: failures are collected and printed in the JSON
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def forceSafe(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try force(fn(spark, sfDir)) catch {
        case t: Throwable =>
          failed += name
          System.err.println(s"[bench] query $name FAILED: ${t.getMessage}")
      }
    val cold0 = System.nanoTime()
    SparkEntry.queries.foreach { case (name, fn) => forceSafe(name, fn) }
    val coldTotal = (System.nanoTime() - cold0) / 1e9
    // best-of-2 warm passes per query (same treatment as stageBench):
    // this box is a shared VM with spiky steal time, so a single warm
    // pass swings 2-4x and round-over-round deltas mean nothing
    def timedPass(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        forceSafe(name, fn)
        name -> (System.nanoTime() - t0) / 1e9
      }
    val (w1, w2) = (timedPass(), timedPass())
    val warm = w1.map { case (name, v) => name -> math.min(v, w2(name)) }

    // stage bench first: the scaling-efficiency metric runs on a quiet
    // JVM before the long BFS loads the heap. Every section is
    // steal-gated (retryOnSteal) so the committed artifact's headline
    // numbers are from clean windows — or carry their steal context
    // when the host never offered one.
    val crawl =
      retryOnSteal("stage", "stage_urls_per_sec", maxTries = 3) {
        stageBench(spark,
          sys.env.getOrElse("SPARK_GRAFT_BENCH_URLS", "100000").toInt)
      } ++
      retryOnSteal("polite", "polite_efficiency_vs_floor", maxTries = 3) {
        politeBench(spark,
          sys.env.getOrElse("SPARK_GRAFT_BENCH_POLITE_URLS", "40000").toInt,
          nHosts = 256, rps = 20.0)
      } ++
      retryOnSteal("dedup", "dedup_bloom_rows_per_sec", maxTries = 2) {
        dedupBench(spark,
          nSeen = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEDUP_SEEN", "10000000").toInt,
          nCand = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEDUP_CAND", "10000000").toInt)
      } ++
      jaccardBench(spark, sfDir) ++
      annRecallBench(spark, sfDir) ++
      annClusteredRecallBench(spark) ++
      retryOnSteal("cc_chain", "cc_chain_edges_per_sec", maxTries = 2) {
        ccBench(spark, shape = "chain",
          nEdges = sys.env.getOrElse("SPARK_GRAFT_BENCH_CC_EDGES", "10000000").toInt)
      } ++
      retryOnSteal("cc_star", "cc_star_edges_per_sec", maxTries = 2) {
        ccBench(spark, shape = "star",
          nEdges = sys.env.getOrElse("SPARK_GRAFT_BENCH_CC_EDGES", "10000000").toInt)
      } ++
      retryOnSteal("crawl", "crawl_urls_per_sec", maxTries = 2) {
        crawlBench(spark, crawlCats, nHosts = 32)
      } ++
      // the payload axis: spanize → assemble → pack over the input_hint
      // span schema (legs steal-gate themselves inside interleaveBench)
      interleaveBench(spark,
        sys.env.getOrElse("SPARK_GRAFT_BENCH_IX_DOCS", "1000000").toLong)

    val qs = warm.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${"%.4f".format(v)}""" }
      .mkString("{", ",", "}")
    val cs = crawl.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${"%.4f".format(v)}""" }
      .mkString("{", ",", "}")
    val total = coldTotal + crawl("crawl_sec") + warm.values.sum
    val failedJson = failed.map(n => s""""$n"""").mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec",""" +
        s""""queries":$qs,"crawl":$cs,"cpus":$cpus,""" +
        s""""failed_queries":$failedJson,""" +
        s""""warm_queries_sec":${"%.3f".format(warm.values.sum)},""" +
        s""""cold_queries_sec":${"%.3f".format(coldTotal)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
