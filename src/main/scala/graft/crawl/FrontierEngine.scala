package graft.crawl

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.UrlFunctions.{hostOf, originOf}
import graft.html.CategoryExtractor
import graft.tables.IceLite

/** Distributed frontier crawler: the reference's FIFO BFS
  * (`zhwiki_all.py:428-501`) re-expressed as level-synchronous Spark
  * supersteps over IceLite state tables, reproducing the exact crawl
  * order, frontier row order, and URL-seen set of SimCrawler
  * (SURVEY.md §7.3 ordering-equivalence argument).
  *
  * Per superstep:
  *   queue (url, seq) —repartition by salted host→ mapPartitions fetch
  *   (politeness token pacing + robots) → explode category links →
  *   • frontier rows: non-article rows unconditional; article rows
  *     anti-joined (J2: full 4-tuple vs all prior rows, in-page dups
  *     kept) behind a persistent Bloom prefilter
  *   • enqueue: first-wins per url by (parent_seq, emit_idx) →
  *     anti-join vs seen → blocklist (subcat section only) → contiguous
  *     seq assignment continuing the global crawl order
  *   • atomic IceLite commits: frontier+seen append, queue overwrite —
  *     crash-resume re-reads the last committed snapshots.
  *
  * Scale notes (10^10-URL design point):
  *  - per-superstep shuffles: the host repartition, the first-wins
  *    window (hash by url), and the two anti-joins — nothing else;
  *  - the Bloom filters are PERSISTENT and driver-merged: built once at
  *    startup (or resume) and OR-merged with each superstep's candidate
  *    delta, so no per-superstep full-table scan or count; the bloom is
  *    a superset of the true set (false positives and over-approximated
  *    deltas only route rows into the exact anti-join, which stays
  *    authoritative — bloom can never change the seen set);
  *  - hot-host skew: a single host serializes politeness, so the host
  *    hash is salted (`saltFactor` slices/host) and each slice paces at
  *    budget/saltFactor — aggregate per-host rate preserved;
  *  - seq assignment uses sorted zipWithIndex (two narrow passes), not
  *    a single-partition window;
  *  - fetch metrics ride the one per-superstep collect (tiny rows), so
  *    the cached fetch result is materialized exactly once.
  */
final case class CrawlConfig(
    workDir: String,
    blockedUrls: Set[String] = Set(PageStore.BlockedUrl),
    robots: RobotsPolicy = RobotsPolicy.allowAll,
    maxRpsPerHost: Double = 0.0, // 0 = unlimited (tests); 1.0 mirrors request_sleep=1
    saltFactor: Int = 4,
    fetchPartitions: Int = 0, // 0 = spark.sql.shuffle.partitions
    useBloom: Boolean = true,
    bloomExpectedItems: Long = 10000000L, // sizing; shard the bloom beyond ~10^9
    bloomMinRows: Long = 2000000L, // activate prefilter once seen ≥ this
    // persistent seen-filter shard kind: "bloom" (Spark sketch, fpp
    // 1%) or "cuckoo" (graft.sketch.CuckooFilter — deletable, ~0.012%
    // FPP at ~8.4 bits/key; the other half of the north rule's
    // "bloom/cuckoo URL-seen"). Same superset contract either way —
    // the filter only routes rows into the exact anti-join. The
    // RECENT-delta overlay stays a bloom (transient, merged in-memory;
    // cuckoo filters don't OR-merge).
    seenFilterKind: String = "bloom",
    maxSupersteps: Int = 100000,
    // files written per state-table append/overwrite. Every superstep
    // RE-READS the full frontier/seen tables for the exact anti-joins,
    // so the file count (supersteps × appendFiles) binds re-read cost:
    // 32 files/superstep made late supersteps spend 1.4-2.4 s just
    // listing/opening parquet footers (measured r2). 4 bounds that at
    // ~4×supersteps files; raise at 10^10 scale where per-superstep
    // deltas are GBs and 4 write tasks would bottleneck (or add
    // compaction). Applied via repartition (not coalesce) so the
    // upstream join/window parallelism is unaffected.
    appendFiles: Int = 4,
    // state-table compaction cadence: every `compactEvery` supersteps
    // the frontier/seen/metrics tables are rewritten to files of
    // ~`compactTargetBytes` (IceLite.compact). appendFiles bounds
    // per-commit growth; compaction bounds LIFETIME growth — a
    // 10^3-superstep crawl stays at O(total/target) files instead of
    // 4×10^3. 0 disables.
    compactEvery: Int = 64,
    compactTargetBytes: Long = 128L << 20,
    // > 0 enables the hash-bucketed seen-table mirror: compaction
    // rewrites the seen set as a Spark bucketed table (bucketBy on url,
    // one file per bucket) and the per-superstep exact anti-join chains
    // (recent deltas → mirror), reading the mirror with NO right-side
    // Exchange/Sort — the storage-partitioned join. Measured 2.8-4.2×
    // on the 10M×10M anti-join (graft.BucketProbe). Size at ~1-2 GB of
    // seen rows per bucket at the 10^10 design point.
    seenBuckets: Int = 0,
    // > 0 expires old snapshots (IceLite.vacuum) at the compaction
    // cadence, keeping this many versions. Every compaction leaves the
    // full pre-compaction file set on disk until vacuumed, so a long
    // crawl without vacuum stores each state table ~twice per cycle.
    // Keep ≥ 2 so the stableVersion (current-1) reads of a re-executed
    // superstep always resolve. 0 = never delete (full time travel).
    vacuumKeepVersions: Int = 0,
    // > 0 splits each superstep's fetch into sequential sub-batches of
    // at most this many queue rows. politeFetch materializes its
    // partition's (url, seq) entries for slice-round-robin pacing, so
    // per-task memory is queueRows/nPart — at a 10^10 frontier a
    // multi-million-row superstep needs this cap, NOT relaxed pacing
    // (the politeness budget holds within each sub-batch; across a
    // boundary at most one extra request per pacing slice can bunch).
    // 0 = single batch.
    fetchBatchRows: Long = 0,
    // leaf-pipeline epoch commit granularity (ST2/S9): the reference
    // commits every THREADS*4=128 items; scaled to the distributed
    // setting (≈128 rows/task × 32 tasks). A crash loses at most one
    // epoch. Raise at 10^10 scale — commit cost is O(epochs).
    leafEpochSize: Int = 4096,
    // prior-key cache refresh cadence, in table versions (≈ supersteps),
    // for the NON-mirror anti-join path. The exact anti-joins' right
    // side is "every prior row" — re-read, re-shuffled and re-sorted
    // from parquet EVERY superstep, i.e. Σ-over-steps quadratic bytes
    // through the exchange (measured: the two appends were 1.06 s +
    // 0.66 s of a 2.4 s bench superstep). The fix mirrors the bucketed
    // mirror at memory speed: the prior-key projection is persisted
    // PRE-PARTITIONED AND PRE-SORTED on the join key (InMemoryRelation
    // preserves outputPartitioning/outputOrdering, so the sort-merge
    // join plans NO exchange and NO sort on the cached side), and only
    // the post-cache delta files (≤ priorCacheEvery small appends) join
    // as a separate small chained right. Contents derive from committed
    // snapshots only (version-guarded like the mirror), so re-executed
    // supersteps and crash-resume read identical data. 0 disables.
    // At the 10^10 design point the seen/frontier keys exceed executor
    // storage — there the bucketed mirrors (seenBuckets > 0) carry the
    // same plan shape from disk; the cache is the in-memory analog for
    // crawls that fit (MEMORY_AND_DISK, so an overflow spills, not
    // OOMs).
    priorCacheEvery: Int = 8,
    // F4 fidelity quirk (`zhwiki_leafs.py:113-123`): the reference keys
    // the already-crawled check on the NARROW-sanitized TITLE alone
    // (its save-directory name) — same-titled articles on DIFFERENT
    // hosts collide and only one is ever fetched. true = faithful
    // (default, matches the single-host reference); false = key on
    // (host, title), what a real multi-host crawl wants: no cross-host
    // data loss, while same-host sanitize collisions still conflate.
    fidelityF4: Boolean = true,
    // chaos-injection hook (tests / fault drills): URLs whose link
    // extraction is FORCED to throw, exercising the extract-failure
    // quarantine path end-to-end (CategoryExtractor itself is total on
    // any input, so a drill needs the fault injected at the seam).
    chaosExtractFail: Set[String] = Set.empty,
    // quarantine-storm guard: per-page quarantine exists for the rare
    // poisoned document, but a SYSTEMIC parser bug (bad deploy, format
    // change upstream) would quarantine the whole web and let the crawl
    // "succeed" with zero links. A superstep / leaf epoch ABORTS when
    // more than maxQuarantineFrac of its parsed pages threw AND at
    // least quarantineMinFails threw — the floor keeps small batches
    // from tripping on a handful of genuinely poisoned pages.
    maxQuarantineFrac: Double = 0.5,
    quarantineMinFails: Long = 100
)

object FrontierEngine {

  /** Bloom key separator (a raw concat could collide across columns). */
  val KeySep = ""

  /** Pacing-slice id for a URL: crc32(url) mod saltFactor. crc32 is
    * computable identically in Catalyst (`crc32` function, used in the
    * repartition key) and task-side (java.util.zip.CRC32), so the
    * partitioner and the pacer agree on slice identity — required for
    * the budget guarantee (≤ saltFactor slices per host globally, each
    * paced at budget/saltFactor). */
  def sliceOf(url: String, saltFactor: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(url.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (c.getValue % saltFactor).toInt
  }

  /** Task-side fetch stage: per-(host, slice) politeness pacing via an
    * earliest-deadline scheduler + robots check. A standalone function
    * (not an engine method) so the Spark closure captures only
    * serializable values.
    *
    * A naive "sleep before each over-rate request" stalls the WHOLE
    * partition on one host's gap (measured 0.24× of the politeness
    * ceiling); instead the partition's entries are grouped per slice
    * and drained round-robin by next-allowed-time — the task sleeps
    * only when EVERY slice is ahead of schedule, so wall time ≈
    * max(cpu, slowest slice's quota). Materializes the partition's
    * (url, seq) pairs — bounded by the queue partition size; at
    * 10^10-frontier scale cap fetch-partition row counts (superstep
    * sub-batching) rather than relaxing pacing. */
  def politeFetch(
      store: PageStore,
      robots: RobotsPolicy,
      maxRpsPerHost: Double,
      saltFactor: Int
  )(entries: Iterator[(String, Long)]): Iterator[(String, Long, Option[String])] = {
    def fetchOne(url: String, seq: Long): (String, Long, Option[String]) = {
      val html = if (!robots.allowed(url)) None else store.fetch(url)
      (url, seq, html)
    }
    if (maxRpsPerHost <= 0) entries.map { case (u, s) => fetchOne(u, s) }
    else {
      val gapNs = (1e9 * saltFactor / maxRpsPerHost).toLong
      val bySlice = mutable.LinkedHashMap.empty[(String, Int), mutable.ArrayDeque[(String, Long)]]
      entries.foreach { case (url, seq) =>
        val key = (hostOf(url), sliceOf(url, saltFactor))
        bySlice.getOrElseUpdate(key, mutable.ArrayDeque.empty) += ((url, seq))
      }
      // min-heap by next-allowed fire time
      implicit val ord: Ordering[(Long, (String, Int))] = Ordering.by(-_._1)
      val pq = mutable.PriorityQueue.empty[(Long, (String, Int))]
      val start = System.nanoTime()
      bySlice.keys.foreach(k => pq.enqueue((start, k)))
      new Iterator[(String, Long, Option[String])] {
        override def hasNext: Boolean = pq.nonEmpty
        override def next(): (String, Long, Option[String]) = {
          val (t, key) = pq.dequeue()
          val wait = t - System.nanoTime()
          if (wait > 0) Thread.sleep(wait / 1000000L, (wait % 1000000L).toInt)
          val q = bySlice(key)
          val (url, seq) = q.removeHead()
          if (q.nonEmpty)
            pq.enqueue((math.max(t, System.nanoTime()) + gapNs, key))
          fetchOne(url, seq)
        }
      }
    }
  }

  /** Repartition key for fetch stages: hash(host, pacing slice) — one
    * hot host spreads over exactly saltFactor partitions-worth of
    * slices; the slice id matches task-side `sliceOf` (crc32). Uses the
    * codegen'd host_of expression (registered by UrlExpressions).
    *
    * Returns the RAW 64-bit hash, NOT a value pre-modded to a partition
    * id: `df.repartition(n, expr)` re-hashes the expression with
    * murmur3, so a pre-modded key ∈ [0, n) collapses to ~63% of the
    * partitions (n values → n buckets birthday occupancy) with 2-3×
    * doubled-up partitions — measured r2: 4 of 8 partitions empty and a
    * 0.46 scaling efficiency from exactly this. With the raw hash the
    * (host, slice) cells (≫ nPart of them) spread uniformly, while
    * same-cell rows still co-locate (equal value → same partition),
    * preserving the politeness-budget guarantee. */
  def saltedPartitionKey(url: org.apache.spark.sql.Column, saltFactor: Int): org.apache.spark.sql.Column =
    xxhash64(
      graft.expressions.UrlExpressions.host_of(url),
      pmod(crc32(url.cast("binary")), lit(saltFactor)))

  /** Exact left anti join behind an optional Bloom prefilter probe:
    * rows whose key the probe says "definitely never seen" skip the
    * join shuffle; "might contain" rows go through the exact anti-join
    * (false positives must not drop rows). */
  /** Column name of a pre-computed bloom probe (see mightContainCol):
    * when the caller evaluates the probe BELOW its own exchange (e.g.
    * the first-wins Window shuffle), both union branches here read the
    * flag from the reused shuffle files instead of re-running the UDF
    * and the pre-exchange subtree once per branch. */
  val MightCol = "__might"

  /** Bloom-probe column for `keys` against a broadcast bloom (the
    * monolithic-bloom path; the sharded path builds its probe from
    * BloomShardStore.probeCol instead). */
  def mightContainCol(
      spark: SparkSession, b: BloomFilter, keys: Seq[String]): org.apache.spark.sql.Column = {
    val bloomBc = spark.sparkContext.broadcast(b)
    val mightContain = udf((k: String) => bloomBc.value.mightContain(k))
    mightContain(concat_ws(KeySep, keys.map(col): _*))
  }

  def antiJoinWithBloom(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      probe: Option[org.apache.spark.sql.Column]
  ): DataFrame = antiJoinChainWithBloom(spark, left, Seq(right), keys, probe)

  /** Anti-join `left` against the UNION of `rights`, expressed as a
    * chain of anti-joins (provably equal: a row survives iff it matches
    * no right side) — chaining lets each right keep its own best plan:
    * a small post-mirror delta broadcasts, while the bucketed seen
    * mirror sort-merges with NO right-side exchange. A literal
    * union(rights) would destroy the mirror's storage partitioning.
    * `probe` is any boolean prefilter column that is TRUE whenever the
    * row's key might be in the union of rights (a broadcast bloom, a
    * sharded-bloom probe, or their OR). */
  def antiJoinChainWithBloom(
      spark: SparkSession,
      left: DataFrame,
      rights: Seq[DataFrame],
      keys: Seq[String],
      probe: Option[org.apache.spark.sql.Column]
  ): DataFrame = {
    def chain(l: DataFrame): DataFrame =
      rights.foldLeft(l)((acc, r) => acc.join(r, keys, "left_anti"))
    probe match {
      case None =>
        chain(if (left.columns.contains(MightCol)) left.drop(MightCol) else left)
      case Some(p) =>
        val flagged =
          if (left.columns.contains(MightCol)) left
          else left.withColumn(MightCol, p)
        flagged.filter(!col(MightCol)).drop(MightCol)
          .unionByName(chain(flagged.filter(col(MightCol)).drop(MightCol)))
    }
  }

  def sectionTag(s: CategoryExtractor.Section): String = s match {
    case CategoryExtractor.Subcat     => "subcat"
    case CategoryExtractor.SubcatNext => "subcat_next"
    case CategoryExtractor.Page       => "page"
    case CategoryExtractor.PageNext   => "page_next"
  }

  /** Task-side link extraction for one fetched page.
    *
    * An extract that THROWS (pathological page structure a real crawl
    * will eventually fetch) must not kill the task — at 10^10-frontier
    * scale one poisoned category page would fail the stage after its 4
    * retries and stop the whole BFS. It becomes a single sentinel row
    * (section="extract_failed", title=error, pre_url=the failed page)
    * that the superstep routes to the extract_failures table and drops
    * from the link flow: the page contributes zero links, exactly like
    * a 404. StackOverflowError is caught at this per-page boundary (the
    * stack is unwound by the time the handler runs). */
  def extractLinks(
      r: (String, Long, String),
      chaosFail: Set[String] = Set.empty): Seq[(String, String, String, Int, Long, Long, String)] = {
    val (purl, pseq, html) = r
    try {
      if (chaosFail.contains(purl))
        throw new IllegalStateException("chaos: forced extract failure")
      CategoryExtractor.extract(originOf(purl), html).map { l =>
        (l.url, l.title, purl, l.isleaf, pseq, l.emitIdx.toLong, sectionTag(l.section))
      }
    } catch {
      case e: StackOverflowError =>
        Seq(("", errStr(e), purl, 0, pseq, -1L, "extract_failed"))
      case scala.util.control.NonFatal(e) =>
        Seq(("", errStr(e), purl, 0, pseq, -1L, "extract_failed"))
    }
  }

  private def errStr(e: Throwable): String =
    s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}".take(400)
}

final class FrontierEngine(spark: SparkSession, store: PageStore, cfg: CrawlConfig) {
  import spark.implicits._
  import FrontierEngine.KeySep

  graft.expressions.UrlExpressions.register(spark) // host_of in the partition key

  val frontier = new IceLite(spark, s"${cfg.workDir}/frontier")
  val seen = new IceLite(spark, s"${cfg.workDir}/seen")
  val queue = new IceLite(spark, s"${cfg.workDir}/queue")
  val metrics = new IceLite(spark, s"${cfg.workDir}/metrics")
  /** The crawl-order log: (url, seq, superstep) appended once per
    * superstep — its own append-only table, NOT a reconstruction from
    * the queue's version history. The queue is ephemeral per-superstep
    * state and participates in vacuum like everything else; reading
    * "all queue snapshots ever committed" for the order would list
    * ~4×10^5 files at 10^5 supersteps and force the queue to be
    * vacuum-exempt. This table compacts and vacuums on the shared
    * cadence (append-only, so vacuum only sweeps pre-compaction
    * duplicates). */
  val order = new IceLite(spark, s"${cfg.workDir}/crawl_order")
  /** Quarantined link-extract failures (url, error, superstep) — pages
    * whose [[FrontierEngine.extractLinks]] threw. The page is treated
    * like a 404 (zero links contributed, still marked seen); the row
    * here is the audit trail so a crawl over real web HTML can report
    * and retry poisoned pages instead of dying. */
  val extractFailures = new IceLite(spark, s"${cfg.workDir}/extract_failures")

  /** Bucketed state mirrors (cfg.seenBuckets > 0): refreshed at the
    * compaction cadence; the anti-joins read them exchange-free and
    * only the post-refresh deltas go through a plain (broadcast-able)
    * anti-join. Catalog names are workdir-unique so parallel engines
    * in one JVM (tests) never collide. The frontier mirror holds the
    * J2 key projection (leaf rows, 4 key columns) — at the reference's
    * observed ratio the frontier is ~30× the seen set, so its
    * per-superstep re-shuffle was the larger cost. */
  private val mirrorId =
    graft.functions.TextKernels.md5Hex(cfg.workDir).take(10)
  private val seenMirror: Option[graft.tables.BucketedMirror] =
    if (cfg.seenBuckets > 0)
      Some(new graft.tables.BucketedMirror(
        spark, s"${cfg.workDir}/seen_mirror", s"graft_seen_$mirrorId",
        cfg.seenBuckets, Seq("url"), "url STRING"))
    else None
  private val FrontierKeyCols = Seq("url", "title", "pre_url", "isleaf")
  private val frontierMirror: Option[graft.tables.BucketedMirror] =
    if (cfg.seenBuckets > 0)
      Some(new graft.tables.BucketedMirror(
        spark, s"${cfg.workDir}/frontier_mirror", s"graft_front_$mirrorId",
        cfg.seenBuckets, FrontierKeyCols,
        "url STRING, title STRING, pre_url STRING, isleaf INT"))
    else None

  private val nPart =
    if (cfg.fetchPartitions > 0) cfg.fetchPartitions
    else spark.conf.get("spark.sql.shuffle.partitions").toInt

  /** In-memory prior-key cache for the non-mirror anti-join path (see
    * CrawlConfig.priorCacheEvery): the right side of the exact
    * anti-join, persisted pre-partitioned + pre-sorted on the join key
    * so the per-superstep join moves only the candidate side and the
    * post-cache delta. Version-guarded: rightsFor(stableV) only ever
    * serves data ≤ stableV, refreshing at the configured cadence. */
  private final class PriorKeyCache(
      t: IceLite, keys: Seq[String], project: DataFrame => DataFrame) {
    private var cached: Option[(Int, DataFrame)] = None
    def rightsFor(stableV: Int): Seq[DataFrame] = {
      val stale = cached.forall { case (v, _) =>
        v > stableV || stableV - v >= cfg.priorCacheEvery }
      if (stale) {
        cached.foreach(_._2.unpersist())
        // pre-partitioned AND pre-sorted on the join key: with cached
        // plan partitioning preserved (Sessions conf), the sort-merge
        // anti-join streams this side with NO exchange and NO sort —
        // only the small candidate side shuffles+sorts per superstep
        val df = project(t.readAt(stableV))
          .repartition(nPart, keys.map(col): _*)
          .sortWithinPartitions(keys.map(col): _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cached = Some((stableV, df))
      }
      val (v, df) = cached.get
      val deltaFiles = (t.filesAt(stableV).toSet -- t.filesAt(v).toSet).toSeq.sorted
      // shuffle_hash on the delta too: both chained anti-joins then
      // build hash tables on their right sides and the candidate side
      // streams through BOTH with a single exchange and no sorts (SHJ
      // preserves the streamed side's partitioning; SMJ would sort the
      // candidates once per chained join)
      val deltas =
        if (deltaFiles.isEmpty) Nil
        else Seq(project(t.readFiles(deltaFiles)).hint("shuffle_hash"))
      // the cached side carries its partitioning AND sort order into
      // the sort-merge anti-join (no exchange, no sort — see the
      // Sessions conf note); the delta side stays shuffled-hash so the
      // candidate stream is never sorted twice
      deltas :+ df
    }
  }
  private def frontierLeafKeys(df: DataFrame): DataFrame =
    df.filter(col("isleaf") === 1).select(FrontierKeyCols.map(col): _*)
  private val frontierPriorCache: Option[PriorKeyCache] =
    if (cfg.priorCacheEvery > 0)
      Some(new PriorKeyCache(frontier, FrontierKeyCols, frontierLeafKeys))
    else None
  private val seenPriorCache: Option[PriorKeyCache] =
    if (cfg.priorCacheEvery > 0)
      Some(new PriorKeyCache(seen, Seq("url"), _.select("url")))
    else None

  /** Sharded persistent blooms (cfg.seenBuckets > 0): one shard per
    * mirror bucket, built distributed (tasks write shard files — no
    * driver-side merge, no per-superstep broadcast of the full set)
    * and refreshed at the compaction cadence alongside the mirrors.
    * The in-memory seenBloom/leafBloom then hold only the RECENT
    * DELTA (rows since the last shard generation), bounding driver
    * bloom memory by the compaction cadence instead of the full
    * 10^10-key set; the probe is shardMight OR recentMight — still a
    * superset of the committed state. Without buckets, the legacy
    * driver-merged monolith path is used (fine for small crawls). */
  private val seenShards: Option[graft.tables.BloomShardStore] =
    if (cfg.seenBuckets > 0 && cfg.useBloom)
      Some(new graft.tables.BloomShardStore(
        s"${cfg.workDir}/seen_blooms", cfg.seenBuckets, Seq("url"),
        cfg.seenFilterKind))
    else None
  private val leafShards: Option[graft.tables.BloomShardStore] =
    if (cfg.seenBuckets > 0 && cfg.useBloom)
      Some(new graft.tables.BloomShardStore(
        s"${cfg.workDir}/frontier_blooms", cfg.seenBuckets, FrontierKeyCols,
        cfg.seenFilterKind))
    else None
  private def perShardExpected: Long =
    math.max(1024L, cfg.bloomExpectedItems / math.max(1, cfg.seenBuckets))

  // in-memory prefilters: the full set (legacy path) or the recent
  // delta since the shard generation (sharded path); None until the
  // first non-empty build (all blooms come from stat.bloomFilter with
  // identical sizing → merge-compatible)
  private var seenBloom: Option[BloomFilter] = None
  private var leafBloom: Option[BloomFilter] = None
  private var bloomsReady = false
  /** Diagnostic: how the last initBlooms resolved — "loaded-shards"
    * (resume path, no full-table scan), "built-shards" (distributed
    * first build), or "driver-merged" (legacy monolith). */
  private[crawl] var lastBloomInit: String = "never"

  /** None for an empty input (stat.bloomFilter NPEs on zero rows, and
    * an empty delta has nothing to merge anyway). */
  private def buildBloom(df: DataFrame, keys: Seq[String]): Option[BloomFilter] = {
    val keyed = df.select(concat_ws(KeySep, keys.map(col): _*).as("k"))
    if (keyed.isEmpty) None
    else Some(keyed.stat.bloomFilter("k", cfg.bloomExpectedItems, 0.01))
  }

  private def mergeBloom(cur: Option[BloomFilter], delta: Option[BloomFilter]): Option[BloomFilter] =
    (cur, delta) match {
      case (Some(a), Some(d)) => a.mergeInPlace(d); Some(a)
      case (None, d)          => d
      case (a, None)          => a
    }

  // driver-side approximate seen size: gates bloom activation (the
  // prefilter only pays for itself once the exact anti-join's right
  // side is large; below the threshold it is pure overhead)
  private var seenApprox: Long = -1L

  private def bloomActive: Boolean =
    cfg.useBloom && seenApprox >= cfg.bloomMinRows

  /** Files appended to `t` after version `gen` (the recent-delta base
    * for resume). Falls back to the full current file list if gen's
    * manifest was expired — a superset, so still correct. */
  private def deltaFilesSince(t: IceLite, gen: Int): Seq[String] = {
    val cur = t.filesAt(t.currentVersion).toSet
    val base =
      try t.filesAt(gen).toSet
      catch { case _: java.nio.file.NoSuchFileException => Set.empty[String] }
    (cur -- base).toSeq.sorted
  }

  private def buildBloomFromFiles(t: IceLite, files: Seq[String], keys: Seq[String]): Option[BloomFilter] =
    if (files.isEmpty) None
    else buildBloom(t.readFiles(files), keys)

  private def initBlooms(): Unit = if (bloomActive && !bloomsReady) {
    (seenShards, leafShards) match {
      case (Some(ss), Some(ls)) if ss.generation > 0 && ls.generation > 0 =>
        // resume: shards load lazily from their files — NO full-table
        // scan. Only the post-generation delta (file diff) is rebuilt.
        seenBloom = buildBloomFromFiles(seen,
          deltaFilesSince(seen, ss.generation), Seq("url"))
        leafBloom = buildBloomFromFiles(frontier,
          deltaFilesSince(frontier, ls.generation), FrontierKeyCols)
        lastBloomInit = "loaded-shards"
      case (Some(ss), Some(ls)) =>
        // first activation: distributed shard build (each task writes
        // its own shard — nothing merges on the driver)
        ss.refresh(seen.read().select("url"), seen.currentVersion, perShardExpected)
        ls.refresh(
          frontier.read().filter(col("isleaf") === 1)
            .select(FrontierKeyCols.map(col): _*),
          frontier.currentVersion, perShardExpected)
        seenBloom = None
        leafBloom = None
        lastBloomInit = "built-shards"
      case _ =>
        seenBloom = buildBloom(seen.read(), Seq("url"))
        leafBloom = buildBloom(
          frontier.read().filter(col("isleaf") === 1),
          Seq("url", "title", "pre_url", "isleaf"))
        lastBloomInit = "driver-merged"
    }
    bloomsReady = true
  }

  /** Seen-set prefilter probe: sharded-bloom probe OR'd with the
    * recent-delta bloom (sharded path), or the monolith bloom probe
    * (legacy path). None when no prefilter is available. */
  private def seenProbe: Option[org.apache.spark.sql.Column] =
    probeFor(seenShards, seenBloom, Seq("url"))

  private def leafProbe: Option[org.apache.spark.sql.Column] =
    probeFor(leafShards, leafBloom, FrontierKeyCols)

  private def probeFor(
      shards: Option[graft.tables.BloomShardStore],
      recent: Option[BloomFilter],
      keys: Seq[String]): Option[org.apache.spark.sql.Column] = {
    if (!bloomActive || !bloomsReady) return None
    val shardProbe = shards.filter(_.generation > 0).map(_.probeCol(keys.map(col)))
    val recentProbe = recent.map(b => FrontierEngine.mightContainCol(spark, b, keys))
    (shardProbe, recentProbe) match {
      case (Some(s), Some(r)) => Some(s || r)
      case (s, r)             => s.orElse(r)
    }
  }

  /** Initialize state from seeds unless resuming (queue table present).
    * Idempotent: the queue overwrite is init's commit point, and each
    * append is tag-guarded (appendOnce), so a crash mid-init re-runs
    * safely instead of leaving the engine half-seeded. */
  def init(): Unit = {
    if (!queue.isEmpty) return // resume path
    val seeds = store.seeds
    appendOnce(frontier, "seeds", {
      seeds.zipWithIndex.map { case ((url, title, pre, isleaf), i) =>
        (url, title, pre, isleaf, -1L, i.toLong)
      }.toDF("url", "title", "pre_url", "isleaf", "parent_seq", "emit_idx")
    }, coalesceTo = 1)
    appendOnce(seen, "seeds", seeds.map(_._1).toDF("url"), coalesceTo = 1)
    val qSeeds = seeds.zipWithIndex.collect {
      case ((url, _, _, 0), i) => (url, i.toLong)
    }
    appendOnce(order, "order k=0",
      qSeeds.map { case (url, s) => (url, s, 0) }.toDF("url", "seq", "superstep"),
      coalesceTo = 1)
    queue.overwrite(qSeeds.toDF("url", "seq"),
      "superstep=0 nextSeq=" + seeds.count(_._4 == 0), coalesceTo = 1)
  }

  /** Version of `t` excluding an append already made for tag `tag`
    * (crash-resume: a re-executed superstep must read pre-superstep
    * snapshots or its recomputation would see its own half-committed
    * effects — e.g. the seen-set delta would empty the recomputed
    * queue). */
  private def stableVersion(t: IceLite, tag: String): Int = {
    val v = t.currentVersion
    if (v > 0 && t.lineageAt(v) == tag) v - 1 else v
  }

  /** Append exactly once per (table, tag): re-executed supersteps skip
    * appends that already committed (results are deterministic, so the
    * skipped recomputation is identical to what was committed). */
  private def appendOnce(t: IceLite, tag: String, df: => DataFrame, coalesceTo: Int = 0): Unit =
    if (!(t.currentVersion > 0 && t.lineageAt(t.currentVersion) == tag))
      t.append(df, tag, coalesceTo)

  /** Small daemon pool for overlapping the superstep's INDEPENDENT
    * state-table commits (guide §2.6 back-fill): each append is a small
    * write job with a fixed scheduling + commit-protocol floor
    * (measured ~0.3 s even for a 26k-row delta), and the metrics /
    * frontier / seen commits have no cross-table ordering constraint —
    * crash-resume is per-table idempotent via appendOnce tags, and only
    * the queue overwrite (the superstep's commit point) must come last,
    * after ALL of them are awaited durable. */
  private val appendEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(3,
        (r: Runnable) => {
          val t = new Thread(r, "graft-append"); t.setDaemon(true); t
        }))

  // env-gated phase timing for superstep cost attribution (bench tuning)
  private val timing = sys.env.get("GRAFT_SUPERSTEP_TIMING").contains("1")
  private def phase[A](k: Int, name: String)(body: => A): A = {
    if (!timing) body
    else {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[superstep $k] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
  }

  /** One superstep. Returns (next queue size, fetched count).
    * `queueRows` = the current queue's row count when the caller
    * already knows it (run() does — it is the previous step's nq);
    * -1 = count it here (direct/test callers). */
  def superstep(k: Int, nextSeqStart: Long, queueRows: Long = -1L): (Long, Long) = {
    if (seenApprox < 0) seenApprox = seen.read().count() // resume/startup
    initBlooms()
    val q = queue.read().as[(String, Long)]

    // bind to locals so the task closure captures values, not `this`
    val (st, rb, rps, sf) = (store, cfg.robots, cfg.maxRpsPerHost, cfg.saltFactor)
    val fetchFn = FrontierEngine.politeFetch(st, rb, rps, sf) _
    // fetch stage: salted-host repartition so one hot host spreads over
    // saltFactor partitions, each pacing at budget/saltFactor
    def fetchOf(part: org.apache.spark.sql.Dataset[(String, Long)]): DataFrame =
      part
        .repartition(nPart,
          FrontierEngine.saltedPartitionKey(col("url"), cfg.saltFactor))
        .as[(String, Long)]
        .mapPartitions(fetchFn)
        .toDF("url", "seq", "html")
    // sub-batching (cfg.fetchBatchRows): seq-mod chunks, each
    // MATERIALIZED before the next starts — sequencing is what keeps
    // the per-host politeness budget intact across a superstep; chunk
    // membership is deterministic so results are batching-invariant.
    // Only the CHUNKS are persisted (the single-batch path is one
    // chunk): downstream reads of the union pull from the chunk caches,
    // so persisting the union too would cache the superstep's fetched
    // HTML twice — at exactly the frontier scale the sub-batching
    // exists to bound memory for.
    val fetchedChunks: Seq[DataFrame] =
      if (cfg.fetchBatchRows <= 0) Seq(fetchOf(q).persist())
      else {
        val total = q.count()
        val nChunks = math.max(1L, (total + cfg.fetchBatchRows - 1) / cfg.fetchBatchRows).toInt
        (0 until nChunks).map { i =>
          val f = fetchOf(q.filter(pmod(col("seq"), lit(nChunks)) === i).as[(String, Long)])
          f.persist()
          f.count() // sequential materialization point
          f
        }
      }
    val fetched = fetchedChunks.reduce(_ unionByName _)

    // materialize the fetch exactly once, collecting per-partition
    // metrics in the same pass (replaces MyLog counters,
    // `zhwiki_all.py:332-333`)
    val metricRows = phase(k, "fetch+metrics") {
      fetched
        .groupBy(spark_partition_id().as("partition"))
        .agg(
          count(lit(1)).as("fetched"),
          sum(when(col("html").isNull, 1L).otherwise(0L)).as("errors"))
        .collect()
        .map(r => (k, r.getInt(0), r.getLong(1), r.getLong(2)))
    }
    val nFetched = metricRows.map(_._3).sum
    val fMetrics = scala.concurrent.Future {
      phase(k, "metrics append") {
        appendOnce(metrics, s"metrics k=$k",
          metricRows.toSeq.toDF("superstep", "partition", "fetched", "errors"),
          coalesceTo = 1)
      }
    }(appendEc)

    val chaosFail = cfg.chaosExtractFail
    // lazy localCheckpoint, not persist (r6): same caching, but the
    // LOGICAL plan truncates to the materialized RDD — every downstream
    // transformation (five branches hang off the link table) re-runs
    // eager analysis over its whole ancestor tree, and the fetch+
    // extract subtree was costing ~0.4 s/superstep of driver-serial
    // analyzer time across the branches. Blocks are freed by the
    // ContextCleaner when the superstep's references drop.
    val linksAll = fetched
      .filter(col("html").isNotNull)
      .as[(String, Long, String)]
      .flatMap(r => FrontierEngine.extractLinks(r, chaosFail))
      .toDF("url", "title", "pre_url", "isleaf", "parent_seq", "emit_idx", "section")
      .localCheckpoint(false)
    // quarantined extract failures (see extractLinks): out of the link
    // flow, into their own table — the page acts like a 404
    val xFails = linksAll.filter(col("section") === "extract_failed")
    val nXFails = phase(k, "extract-fail count") { xFails.count() }
    if (nXFails > 0) {
      appendOnce(extractFailures, s"extract_failures k=$k",
        xFails.select(col("pre_url").as("url"), col("title").as("error"))
          .withColumn("superstep", lit(k)),
        coalesceTo = 1)
      // storm guard: failures table is already appended (audit trail
      // survives the abort), denominator = pages that HAD html to parse
      val htmlPages = nFetched - metricRows.map(_._4).sum
      if (nXFails >= cfg.quarantineMinFails && htmlPages > 0 &&
          nXFails.toDouble / htmlPages > cfg.maxQuarantineFrac)
        throw new IllegalStateException(
          s"quarantine storm: $nXFails of $htmlPages extracts threw in " +
            s"superstep $k — systemic parser failure, not poisoned pages")
    }
    val links = linksAll.filter(col("section") =!= "extract_failed")

    // ---- frontier rows (Tot_urls semantics) ----
    val nonPage = links.filter(col("section") =!= "page")
      .select("url", "title", "pre_url", "isleaf", "parent_seq", "emit_idx")
    val pageCand = links.filter(col("section") === "page")
      .select("url", "title", "pre_url", "isleaf", "parent_seq", "emit_idx")
    // J2: anti-join on the full 4-tuple vs ALL prior rows (cross-parent
    // collisions within a superstep are impossible — pre_url differs)
    val frontierTag = s"rows k=$k"
    val stableF = stableVersion(frontier, frontierTag)
    def priorKeysOf(df: DataFrame): DataFrame =
      df.filter(col("isleaf") === 1).select(FrontierKeyCols.map(col): _*)
    val priorRights: Seq[DataFrame] = phase(k, "prior-rights plan") {
      frontierMirror.filter(m => m.version > 0 && m.version <= stableF) match {
        case Some(m) =>
          val deltaFiles =
            (frontier.filesAt(stableF).toSet -- frontier.filesAt(m.version).toSet)
              .toSeq.sorted
          val deltas =
            if (deltaFiles.isEmpty) Nil
            else Seq(priorKeysOf(frontier.readFiles(deltaFiles)))
          deltas :+ m.table()
        case None =>
          frontierPriorCache match {
            case Some(c) => c.rightsFor(stableF)
            case None    => Seq(priorKeysOf(frontier.readAt(stableF)))
          }
      }
    }
    val pageRows = FrontierEngine.antiJoinChainWithBloom(
      spark, pageCand, priorRights, Seq("url", "title", "pre_url", "isleaf"),
      leafProbe)
    val fFrontier = scala.concurrent.Future {
      phase(k, "frontier append") {
        appendOnce(frontier, frontierTag,
          nonPage.unionByName(pageRows).repartition(cfg.appendFiles))
      }
    }(appendEc)

    // ---- enqueue (queue/viewed semantics) ----
    val cand = links.filter(col("section") =!= "page")
    val w = Window.partitionBy(col("url")).orderBy(col("parent_seq"), col("emit_idx"))
    // bloom probe computed HERE, below the first-wins Window exchange:
    // the anti-join's two branches then share the probed rows through
    // the reused shuffle instead of re-running the UDF and the Window
    // subtree once per branch (the probe is url-deterministic, so it
    // commutes with first-wins row selection)
    val candProbed = seenProbe match {
      case Some(p) => cand.withColumn(FrontierEngine.MightCol, p)
      case None    => cand
    }
    val firstWins = candProbed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
    val seenTag = s"seen k=$k"
    val stableV = stableVersion(seen, seenTag)
    // right side(s) of the seen dedup: with an up-to-date bucketed
    // mirror, chain (post-refresh deltas → mirror); the mirror side
    // joins with no Exchange/Sort. Falls back to the plain snapshot
    // read when the mirror is absent or ahead of the stable version
    // (possible only for a crash between mirror refresh and adopt).
    val seenRights: Seq[DataFrame] = phase(k, "seen-rights plan") {
      seenMirror.filter(m => m.version > 0 && m.version <= stableV) match {
        case Some(m) =>
          val deltaFiles =
            (seen.filesAt(stableV).toSet -- seen.filesAt(m.version).toSet).toSeq.sorted
          val deltas =
            if (deltaFiles.isEmpty) Nil
            else Seq(seen.readFiles(deltaFiles).select("url"))
          deltas :+ m.table()
        case None =>
          seenPriorCache match {
            case Some(c) => c.rightsFor(stableV)
            case None    => Seq(seen.readAt(stableV))
          }
      }
    }
    // lazy localCheckpoint for the same plan-truncation reason as
    // linksAll: unseen feeds the seen append, the queue seq assignment
    // and two more commits — each would re-analyze the whole window +
    // anti-join chain tree otherwise
    val unseen = FrontierEngine.antiJoinChainWithBloom(
      spark, firstWins, seenRights, Seq("url"),
      seenProbe)
      .localCheckpoint(false)

    val fSeen = scala.concurrent.Future {
      phase(k, "seen append") {
        appendOnce(seen, seenTag, unseen.select("url").repartition(cfg.appendFiles))
      }
    }(appendEc)

    val blocked = cfg.blockedUrls
    val toQueue = unseen
      .filter(!(col("section") === "subcat" && col("url").isInCollection(
        if (blocked.isEmpty) Seq(" never ") else blocked.toSeq)))
      .select("url", "parent_seq", "emit_idx")

    // contiguous crawl-order seq (r6): sampling-free range bucketing.
    // The queue's seqs are CONTIGUOUS [nextSeqStart - queueRows,
    // nextSeqStart), so equal-width parent_seq ranges ARE a range
    // partitioning with KNOWN bounds — no sampling pass. Global rank =
    // cumulative bucket counts (nB rows of driver metadata) + a
    // per-bucket row_number window; ties cannot exist ((parent_seq,
    // emit_idx) is unique: one first-wins row per url, emit_idx unique
    // per parent). The previous orderBy + rdd.zipWithIndex chain paid a
    // range-sampling job, an eager offsets job, AND re-ran the sort
    // when the persisted RDD materialized (measured 0.30 s/superstep).
    val nextQueue = phase(k, "seq assign") {
      val qRows = math.max(1L,
        if (queueRows >= 0) queueRows else queue.read().count())
      val qStart = nextSeqStart - qRows
      val nB = nPart
      val bucket = least(lit(nB - 1), greatest(lit(0),
        floor((col("parent_seq") - qStart) * nB / qRows.toDouble)))
        .cast("int")
      val withB = toQueue.withColumn("bucket", bucket)
      // per-bucket start offsets: a ≤nB-row aggregate cum-summed through
      // a single-partition window (nB rows — metadata-sized) and joined
      // back by BROADCAST, so the whole seq assignment is ONE lazy plan
      // with no driver collect and no eager job
      val offsets = withB.groupBy("bucket").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum("cnt").over(
          Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select("bucket", "off")
      val wB = Window.partitionBy("bucket").orderBy("parent_seq", "emit_idx")
      withB
        .withColumn("rn", row_number().over(wB))
        .join(broadcast(offsets), "bucket")
        .select(col("url"),
          (lit(nextSeqStart) + col("off") + col("rn") - 1).as("seq"))
        .persist()
    }

    // unseen's cache must be fully materialized (fSeen) before the seq
    // count scans it — a concurrent first-touch would compute partitions
    // twice, not corrupt them, but the await costs nothing extra here
    scala.concurrent.Await.result(fSeen, scala.concurrent.duration.Duration.Inf)
    val nq = phase(k, "queue seq+count") { nextQueue.count() }
    // crawl-order log BEFORE the queue overwrite (the commit point):
    // once step k+1's queue lands, its order rows are guaranteed
    // committed; a crash in between re-executes step k and appendOnce
    // skips the already-committed tag (deterministic recomputation)
    // overlapped like the other appends (reads the nextQueue cache the
    // count just materialized); only the queue overwrite below must
    // wait for it
    val fOrder = scala.concurrent.Future {
      if (nq > 0) phase(k, "order append") {
        appendOnce(order, s"order k=${k + 1}",
          nextQueue.withColumn("superstep", lit(k + 1)),
          coalesceTo = cfg.appendFiles)
      }
    }(appendEc)
    // the queue overwrite is the superstep's commit point: once it
    // lands, re-execution of step k is impossible (k advances) — so
    // every overlapped append must be durable FIRST
    scala.concurrent.Await.result(fFrontier, scala.concurrent.duration.Duration.Inf)
    scala.concurrent.Await.result(fMetrics, scala.concurrent.duration.Duration.Inf)
    scala.concurrent.Await.result(fOrder, scala.concurrent.duration.Duration.Inf)
    phase(k, "queue overwrite") {
      // nextQueue is already materialized (count above), so coalesce
      // here only merges cached partitions for the write
      queue.overwrite(nextQueue, s"superstep=${k + 1} nextSeq=${nextSeqStart + nq}",
        coalesceTo = cfg.appendFiles)
    }

    // merge candidate deltas into the persistent blooms (supersets of
    // the committed deltas — over-approximation is safe)
    if (bloomActive && bloomsReady) phase(k, "bloom merge") {
      seenBloom = mergeBloom(seenBloom, buildBloom(cand.select("url"), Seq("url")))
      leafBloom = mergeBloom(leafBloom,
        buildBloom(pageCand, Seq("url", "title", "pre_url", "isleaf")))
    }
    seenApprox += nq // lower bound on the seen delta (blocked adds excluded)

    phase(k, "unpersist") {
      fetchedChunks.foreach(c => { c.unpersist(); () })
      freeCheckpoint(linksAll)
      freeCheckpoint(unseen)
      nextQueue.unpersist()
    }
    (nq, nFetched)
  }

  /** Free a localCheckpoint'd DataFrame's cached blocks eagerly
    * (df.unpersist() can't — the plan root is the checkpoint RDD, not a
    * cache entry; without this the ContextCleaner frees them only at
    * some later GC, and 10^3-superstep crawls would stack gigabytes of
    * dead link tables in the block manager meanwhile). */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false); ()
      case _ => ()
    }

  /** Run to completion (or maxSupersteps). Returns supersteps executed. */
  def run(): Int = {
    init()
    var k = lineageSuperstep(queue.lineageAt(queue.currentVersion))
    var nextSeq = lineageNextSeq(queue.lineageAt(queue.currentVersion))
    var pending = queue.read().count()
    var steps = 0
    while (pending > 0 && steps < cfg.maxSupersteps) {
      val (nq, _) = phase(k, "WHOLE superstep") { superstep(k, nextSeq, pending) }
      nextSeq += nq
      pending = nq
      k += 1
      steps += 1
      // compaction AFTER the queue overwrite (the superstep's commit
      // point): a crash mid-compaction can only orphan data files, and
      // resume re-reads identical content from the compacted snapshot
      if (cfg.compactEvery > 0 && k % cfg.compactEvery == 0) {
        frontier.compact(cfg.compactTargetBytes, s"compact k=$k")
        // frontier mirror AFTER the frontier compaction so the file-diff
        // delta base is the post-compaction snapshot
        val frontierMirrorFiles: Seq[String] = frontierMirror.map { m =>
          m.refresh(
            frontier.read().filter(col("isleaf") === 1)
              .select(FrontierKeyCols.map(col): _*),
            frontier.currentVersion)
        }.getOrElse(Nil)
        val seenMirrorFiles: Seq[String] = seenMirror match {
          case Some(m) =>
            // ONE rewrite serves both: the bucketed mirror refresh IS
            // the seen table's compaction — its files are adopted as
            // the new snapshot (content identical by construction). A
            // crash between refresh and adopt leaves the mirror one
            // version ahead; the superstep guard falls back to the
            // plain read and the next cycle repairs it.
            val vNew = seen.currentVersion + 1
            val files = m.refresh(seen.read().select("url"), vNew)
            val adopted = seen.adoptFiles(files, s"compact-bucketed k=$k")
            require(adopted == vNew,
              s"concurrent seen write during mirror refresh: $adopted != $vNew")
            files
          case None =>
            seen.compact(cfg.compactTargetBytes, s"compact k=$k")
            Nil
        }
        metrics.compact(cfg.compactTargetBytes, s"compact k=$k")
        order.compact(cfg.compactTargetBytes, s"compact k=$k")
        // sharded blooms rebuild ZERO-SHUFFLE from the mirrors' freshly
        // written bucket files (the mirror writer already routed every
        // row by the same murmur3(keys) % buckets — one single-task job
        // per bucket); the recent-delta blooms reset — the new shard
        // generation covers everything committed, so driver bloom
        // memory stays bounded by one compaction cycle's deltas, not
        // the crawl
        if (bloomActive && bloomsReady) {
          seenShards.foreach { ss =>
            ss.refreshFromBucketedFiles(spark, seenMirrorFiles,
              seen.currentVersion, perShardExpected)
            seenBloom = None
          }
          leafShards.foreach { ls =>
            ls.refreshFromBucketedFiles(spark, frontierMirrorFiles,
              frontier.currentVersion, perShardExpected)
            leafBloom = None
          }
        }
        // vacuum LAST, after both mirrors point at current versions:
        // everything older than (current-1) is unreachable — resume
        // and re-executed supersteps only read current / current-1,
        // and mirror deltas diff against the just-refreshed version
        if (cfg.vacuumKeepVersions > 0) {
          val keep = math.max(2, cfg.vacuumKeepVersions)
          frontier.vacuum(keep); seen.vacuum(keep)
          metrics.vacuum(keep)
          // queue + order vacuum like everything else now that the
          // crawl-order log is its own append-only table — queue
          // history beyond resume depth is disposable state
          queue.vacuum(keep); order.vacuum(keep)
          // superseded mirror generations die only once no RETAINED
          // snapshot references their files (the seen table adopts
          // mirror files as snapshots)
          def retained(t: IceLite): Set[String] = {
            val v = t.currentVersion
            (math.max(1, v - keep + 1) to v).flatMap(t.filesAt).toSet
          }
          seenMirror.foreach(m => { m.prune(retained(seen)); () })
          frontierMirror.foreach(m => { m.prune(retained(frontier)); () })
        }
      }
    }
    steps
  }

  private def lineageSuperstep(l: String): Int =
    l.split(' ').collectFirst { case s if s.startsWith("superstep=") =>
      s.stripPrefix("superstep=").toInt
    }.getOrElse(0)

  private def lineageNextSeq(l: String): Long =
    l.split(' ').collectFirst { case s if s.startsWith("nextSeq=") =>
      s.stripPrefix("nextSeq=").toLong
    }.getOrElse {
      // bootstrap path: a queue written by an EXTERNAL ingester (e.g.
      // a streaming IceLiteSink append) carries no nextSeq metadata —
      // derive it from the data so batch supersteps continue the
      // global crawl order seamlessly from streamed state
      if (queue.isEmpty) 0L
      else queue.read().agg(max(col("seq"))).head().getLong(0) + 1
    }

  /** Frontier rows in exact Tot_urls/CSV order (for oracle compare). */
  def frontierOrdered(): DataFrame =
    frontier.read().orderBy("parent_seq", "emit_idx")

  /** Crawl order: every fetched URL by seq, from the dedicated
    * crawl_order table (one snapshot read; seqs are globally unique —
    * the dropDuplicates is belt-and-braces against a re-executed
    * superstep double-appending, which appendOnce already prevents). */
  def crawlOrder(): DataFrame = {
    require(!order.isEmpty, "crawlOrder: no committed crawl-order rows")
    order.read().dropDuplicates("seq").orderBy("seq").select("url", "seq")
  }

  def seenSet(): DataFrame = seen.read()

  /** Total fetch attempts so far (crawl-order rows). */
  def crawledCount(): Long = crawlOrder().count()
}
