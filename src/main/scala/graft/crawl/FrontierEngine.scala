package graft.crawl

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *     kept) with optional Bloom prefilter
  *   • enqueue: first-wins per url by (parent_seq, emit_idx) →
  *     anti-join vs seen → blocklist (subcat section only) → contiguous
  *     seq assignment continuing the global crawl order
  *   • atomic IceLite commits: frontier+seen+crawled append, queue
  *     overwrite — crash-resume re-reads the last committed snapshots.
  *
  * Scale notes (10^10-URL design point):
  *  - the only per-superstep shuffles are the host repartition, the
  *    first-wins window (hash by url), and the two anti-joins;
  *  - seen anti-join carries a Bloom prefilter (broadcast, ~1.2 GB at
  *    10^9 keys / 1% fpp) so the sort-merge side only sees candidates
  *    that MIGHT be seen; the exact anti-join stays authoritative
  *    (bloom false positives must not change the seen set);
  *  - hot-host skew: a single host serializes politeness, so the host
  *    hash is salted (`saltFactor` slices/host) and each slice paces at
  *    budget/saltFactor — aggregate per-host rate preserved;
  *  - seq assignment uses sorted zipWithIndex (two narrow passes), not
  *    a single-partition window.
  */
final case class CrawlConfig(
    workDir: String,
    blockedUrls: Set[String] = Set(PageStore.BlockedUrl),
    robots: RobotsPolicy = RobotsPolicy.allowAll,
    maxRpsPerHost: Double = 0.0, // 0 = unlimited (tests); 1.0 mirrors request_sleep=1
    saltFactor: Int = 4,
    fetchPartitions: Int = 0, // 0 = spark.sql.shuffle.partitions
    useBloom: Boolean = true,
    bloomMinRows: Long = 100000L, // below this, exact anti-join alone is cheaper
    maxSupersteps: Int = 100000
)

object FrontierEngine {

  /** Task-side fetch stage: per-host politeness pacing + robots check.
    * A standalone function (not an engine method) so the Spark closure
    * captures only serializable values. Pacing: each salt slice of a
    * host enforces gap = saltFactor / maxRps, so the host's aggregate
    * rate across slices stays ≤ maxRps. */
  def politeFetch(
      store: PageStore,
      robots: RobotsPolicy,
      maxRpsPerHost: Double,
      saltFactor: Int
  )(entries: Iterator[(String, Long)]): Iterator[(String, Long, Option[String])] = {
    val lastHit = mutable.HashMap.empty[String, Long]
    val minGapNs =
      if (maxRpsPerHost <= 0) 0L
      else (1e9 * saltFactor / maxRpsPerHost).toLong
    entries.map { case (url, seq) =>
      val host = hostOf(url)
      if (minGapNs > 0) {
        val now = System.nanoTime()
        val prev = lastHit.getOrElse(host, 0L)
        val wait = prev + minGapNs - now
        if (wait > 0) Thread.sleep(wait / 1000000L, (wait % 1000000L).toInt)
        lastHit(host) = math.max(now, prev + minGapNs)
      }
      val html = if (!robots.allowed(url)) None else store.fetch(url)
      (url, seq, html)
    }
  }

  def sectionTag(s: CategoryExtractor.Section): String = s match {
    case CategoryExtractor.Subcat     => "subcat"
    case CategoryExtractor.SubcatNext => "subcat_next"
    case CategoryExtractor.Page       => "page"
    case CategoryExtractor.PageNext   => "page_next"
  }

  /** Task-side link extraction for one fetched page. */
  def extractLinks(r: (String, Long, String)): Seq[(String, String, String, Int, Long, Long, String)] = {
    val (purl, pseq, html) = r
    CategoryExtractor.extract(originOf(purl), html).map { l =>
      (l.url, l.title, purl, l.isleaf, pseq, l.emitIdx.toLong, sectionTag(l.section))
    }
  }
}

final class FrontierEngine(spark: SparkSession, store: PageStore, cfg: CrawlConfig) {
  import spark.implicits._

  val frontier = new IceLite(spark, s"${cfg.workDir}/frontier")
  val seen = new IceLite(spark, s"${cfg.workDir}/seen")
  val queue = new IceLite(spark, s"${cfg.workDir}/queue")
  val crawled = new IceLite(spark, s"${cfg.workDir}/crawled")
  val metrics = new IceLite(spark, s"${cfg.workDir}/metrics")

  private val nPart =
    if (cfg.fetchPartitions > 0) cfg.fetchPartitions
    else spark.conf.get("spark.sql.shuffle.partitions").toInt

  /** Initialize state from seeds unless resuming (queue table present). */
  def init(): Unit = {
    if (!queue.isEmpty || !frontier.isEmpty) return // resume path
    val seeds = store.seeds
    val seedRows = seeds.zipWithIndex.map { case ((url, title, pre, isleaf), i) =>
      (url, title, pre, isleaf, -1L, i.toLong)
    }.toDF("url", "title", "pre_url", "isleaf", "parent_seq", "emit_idx")
    frontier.append(seedRows, "superstep=0 seeds")
    seen.append(seeds.map(_._1).toDF("url"), "superstep=0 seeds")
    val q = seeds.zipWithIndex.collect {
      case ((url, _, _, 0), i) => (url, i.toLong)
    }.toDF("url", "seq")
    queue.overwrite(q, "superstep=0 nextSeq=" + seeds.count(_._4 == 0))
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
  private def appendOnce(t: IceLite, tag: String, df: => DataFrame): Unit =
    if (!(t.currentVersion > 0 && t.lineageAt(t.currentVersion) == tag))
      t.append(df, tag)

  /** One superstep. Returns the size of the next queue. */
  def superstep(k: Int, nextSeqStart: Long): (Long, Long) = {
    val q = queue.read().as[(String, Long)]

    // fetch stage: salted-host repartition so one hot host spreads over
    // saltFactor partitions, each pacing at budget/saltFactor
    val salted = q
      .repartition(nPart, pmod(
        xxhash64(udfHost(col("url")), pmod(xxhash64(col("url")), lit(cfg.saltFactor))),
        lit(nPart)))
      .as[(String, Long)]
    // bind to locals so the task closure captures values, not `this`
    val (st, rb, rps, sf) = (store, cfg.robots, cfg.maxRpsPerHost, cfg.saltFactor)
    val fetchFn = FrontierEngine.politeFetch(st, rb, rps, sf) _
    val fetched = salted
      .mapPartitions(fetchFn)
      .toDF("url", "seq", "html")
    fetched.persist()

    val links = fetched
      .filter(col("html").isNotNull)
      .as[(String, Long, String)]
      .flatMap(FrontierEngine.extractLinks _)
      .toDF("url", "title", "pre_url", "isleaf", "parent_seq", "emit_idx", "section")
    links.persist()

    // ---- frontier rows (Tot_urls semantics) ----
    val nonPage = links.filter(col("section") =!= "page")
      .select("url", "title", "pre_url", "isleaf", "parent_seq", "emit_idx")
    val pageCand = links.filter(col("section") === "page")
      .select("url", "title", "pre_url", "isleaf", "parent_seq", "emit_idx")
    // J2: anti-join on the full 4-tuple vs ALL prior rows (cross-parent
    // collisions within a superstep are impossible — pre_url differs)
    val frontierTag = s"rows k=$k"
    val prior = frontier.readAt(stableVersion(frontier, frontierTag))
      .filter(col("isleaf") === 1)
      .select("url", "title", "pre_url", "isleaf")
    val pageRows = antiJoinWithBloom(
      pageCand, prior, Seq("url", "title", "pre_url", "isleaf"))
    appendOnce(frontier, frontierTag, nonPage.unionByName(pageRows))

    // ---- enqueue (queue/viewed semantics) ----
    val cand = links.filter(col("section") =!= "page")
    val w = Window.partitionBy(col("url")).orderBy(col("parent_seq"), col("emit_idx"))
    val firstWins = cand
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
    val seenTag = s"seen k=$k"
    val unseen = antiJoinWithBloom(
      firstWins, seen.readAt(stableVersion(seen, seenTag)), Seq("url")).persist()

    appendOnce(seen, seenTag, unseen.select("url"))

    val blocked = cfg.blockedUrls
    val toQueue = unseen
      .filter(!(col("section") === "subcat" && col("url").isInCollection(
        if (blocked.isEmpty) Seq(" never ") else blocked.toSeq)))
      .select("url", "parent_seq", "emit_idx")

    // contiguous crawl-order seq: sorted zipWithIndex (no 1-partition window)
    val ordered = toQueue.orderBy("parent_seq", "emit_idx")
      .select("url").as[String]
    val nextQueue = ordered.rdd
      .zipWithIndex()
      .map { case (url, i) => (url, nextSeqStart + i) }
      .toDF("url", "seq")

    appendOnce(crawled, s"crawled k=$k", q.toDF("url", "seq"))
    val nq = nextQueue.count()
    // the queue overwrite is the superstep's commit point: once it
    // lands, re-execution of step k is impossible (k advances)
    queue.overwrite(nextQueue, s"superstep=${k + 1} nextSeq=${nextSeqStart + nq}")

    // per-partition fetch metrics (replaces MyLog counters,
    // `zhwiki_all.py:332-333`)
    val m = fetched
      .groupBy(spark_partition_id().as("partition"))
      .agg(
        count(lit(1)).as("fetched"),
        sum(when(col("html").isNull, 1L).otherwise(0L)).as("errors"))
      .withColumn("superstep", lit(k))
    appendOnce(metrics, s"metrics k=$k", m)

    val nFetched = fetched.count()
    fetched.unpersist()
    links.unpersist()
    unseen.unpersist()
    (nq, nFetched)
  }

  private val udfHost = udf((u: String) => hostOf(u))

  /** Exact left anti join, with a broadcast Bloom prefilter once the
    * right side is large: rows whose key the bloom definitely hasn't
    * seen skip the shuffle; "might contain" rows go through the exact
    * anti-join (false positives must not drop rows). */
  private def antiJoinWithBloom(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String]
  ): DataFrame = {
    val rightN = if (cfg.useBloom) right.count() else 0L
    if (!cfg.useBloom || rightN < cfg.bloomMinRows) {
      left.join(right, keys, "left_anti")
    } else {
      val keyCol = concat_ws("", keys.map(col): _*)
      val bloom = right
        .select(concat_ws("", keys.map(col): _*).as("k"))
        .stat.bloomFilter("k", rightN, 0.01)
      val bloomBc = spark.sparkContext.broadcast(bloom)
      val mightContain = udf((k: String) => bloomBc.value.mightContain(k))
      val (maybe, definitelyNew) =
        (left.filter(mightContain(keyCol)), left.filter(!mightContain(keyCol)))
      definitelyNew.unionByName(maybe.join(right, keys, "left_anti"))
    }
  }

  /** Run to completion (or maxSupersteps). Returns supersteps executed. */
  def run(): Int = {
    init()
    var k = lineageSuperstep(queue.lineageAt(queue.currentVersion))
    var nextSeq = lineageNextSeq(queue.lineageAt(queue.currentVersion))
    var pending = queue.read().count()
    var steps = 0
    while (pending > 0 && steps < cfg.maxSupersteps) {
      val (nq, _) = superstep(k, nextSeq)
      nextSeq += nq
      pending = nq
      k += 1
      steps += 1
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
    }.getOrElse(0L)

  /** Frontier rows in exact Tot_urls/CSV order (for oracle compare). */
  def frontierOrdered(): DataFrame =
    frontier.read().orderBy("parent_seq", "emit_idx")

  /** Crawl order: every fetched URL by seq (queue pop order). */
  def crawlOrder(): DataFrame = crawled.read().orderBy("seq")

  def seenSet(): DataFrame = seen.read()
}
