package graft.crawl

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions.{hostOf, originOf}
import graft.html.PageParser
import graft.tables.IceLite

/** Article (leaf) pipeline: the reference's `zhwiki_leafs.py` spider
  * re-expressed as one Spark stage chain writing the `docs` table in
  * the interleaved span schema (BASELINE.json input_hint):
  *   (doc_id, spans:array<struct<kind,text,media_ref,offset>>) plus the
  *   wide companions title/zhwiki_url/enwiki_url/page_html.
  *
  * Stages: work list (E3 analytics: isleaf=1 → dedup → project) →
  * already-crawled anti-join (P7, `zhwiki_leafs.py:120-123`) → salted
  * host repartition → mapPartitions polite fetch → parsePage → append.
  * The reference's 7 per-doc files (`pipeline_save`,
  * `zhwiki_leafs.py:1372-1452`) become 7 projections of one row.
  *
  * Media second stage (S11, `zhwiki_leafs.py:1455-1502`): explode image
  * spans → fetch bytes (≤10 retries) → `media` table; failures land in
  * status='failed' rows (the pic_remain.csv analog).
  */
object LeafPipeline {

  final case class SpanRow(kind: String, text: String, media_ref: String, offset: Int)
  final case class DocRow(
      doc_id: String,
      title: String,
      zhwiki_url: String,
      enwiki_url: String,
      page_html: String,
      spans: Seq[SpanRow]
  )

  /** Fetch+parse outcome of one work item: `doc` on success, a
    * non-empty `error` on a parse that threw. Robots-blocked, 404 and
    * redlink pages emit nothing, as the reference does. */
  final case class ParseOut(url: String, title: String, error: String, doc: Option[DocRow])

  private def errStr(e: Throwable): String =
    s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}".take(400)

  /** Task-side: fetch+parse one work item (standalone for clean closures).
    *
    * A page whose parse THROWS must not kill the task: at 10^10-page
    * scale one poisoned document (nesting past the infobox walker's
    * recursion budget, or malformed structure hitting one of the
    * reference-faithful fail-fast branches — the reference itself would
    * simply crash there, `zhwiki_leafs.py:383`) would fail the stage
    * after its 4 retries and take the whole crawl down. It becomes a
    * quarantine row instead (doc=None, error=class+message), landing in
    * the `leaf_failures` table — the parse-side twin of the media
    * stage's status='failed' rows. StackOverflowError is deliberately
    * caught at this per-page boundary: the stack is fully unwound by the
    * time the handler runs, and the alternative is task death. */
  def fetchParse(store: PageStore, robots: RobotsPolicy)(
      it: Iterator[(String, String)]): Iterator[ParseOut] =
    it.flatMap { case (url, title) =>
      val html = if (!robots.allowed(url)) None else store.fetch(url)
      html.flatMap { h =>
        try {
          PageParser.parse(url, originOf(url), h).map { p =>
            ParseOut(url, title, "",
              Some(DocRow(url, title, url, p.enwikiUrl, p.pageHtml,
                p.spans.map(s => SpanRow(s.kind, s.text, s.media_ref, s.offset)))))
          }
        } catch {
          case e: StackOverflowError => Some(ParseOut(url, title, errStr(e), None))
          case scala.util.control.NonFatal(e) => Some(ParseOut(url, title, errStr(e), None))
        }
      }.iterator
    }

  /** E3 work-list derivation (`get_leaves`, `zhwiki_leafs.py:1682-1711`):
    * isleaf==1 → dropDuplicates (full row) → drop pre_url/isleaf →
    * dropDuplicates again. */
  def workList(frontier: DataFrame): DataFrame =
    frontier
      .filter(col("isleaf") === 1)
      .select("url", "title", "pre_url", "isleaf")
      .dropDuplicates()
      .select("url", "title")
      .dropDuplicates()

  /** Priority work list (`get_pri_leaves`, `zhwiki_leafs.py:1723-1748`):
    * the reference crawls 34 NAMED per-category CSVs before everything
    * else. Rebuilt as a priority column over the frontier: a leaf
    * reachable from any category url in `priCats` gets priority 0,
    * everything else 1 — `run` orders epochs by (priority, url, title),
    * so priority items are fetched and committed in the earliest
    * epochs. Same dedup semantics as [[workList]] (full-row distinct,
    * then per-(url,title)). */
  def priorityWorkList(frontier: DataFrame, priCats: Set[String]): DataFrame = {
    val isPri =
      if (priCats.isEmpty) lit(false)
      else col("pre_url").isInCollection(priCats.toSeq)
    frontier
      .filter(col("isleaf") === 1)
      .select("url", "title", "pre_url", "isleaf")
      .dropDuplicates()
      .groupBy("url", "title")
      .agg(min(when(isPri, 0).otherwise(1)).as("priority"))
  }
}

final class LeafPipeline(spark: SparkSession, store: PageStore, cfg: CrawlConfig) {
  import spark.implicits._
  import LeafPipeline._

  val docs = new IceLite(spark, s"${cfg.workDir}/docs")
  val media = new IceLite(spark, s"${cfg.workDir}/media")
  /** Per-(epoch, partition) parse metrics — the leaf-side twin of the
    * frontier metrics table (north-star: per-partition fetch/parse
    * metrics). */
  val leafMetrics = new IceLite(spark, s"${cfg.workDir}/leaf_metrics")
  /** Quarantined parse failures (url, title, error) — pages whose parse
    * threw (see [[LeafPipeline.fetchParse]]). Kept out of `docs` so the
    * crawled-check anti-join retries them on the next run if the parser
    * is fixed; kept out of `leaf_metrics` so the metrics-sum ≡
    * docs-count invariant is untouched. */
  val leafFailures = new IceLite(spark, s"${cfg.workDir}/leaf_failures")

  private val nPart =
    if (cfg.fetchPartitions > 0) cfg.fetchPartitions
    else spark.conf.get("spark.sql.shuffle.partitions").toInt

  /** Crawled-check key (F4 fidelity quirk): the reference keys "already
    * crawled" on the NARROW-sanitized title — the save directory name
    * (`zhwiki_leafs.py:113-123`), NOT the url. Two work items whose
    * titles sanitize identically collide: once one is committed, the
    * other is skipped forever. With cfg.fidelityF4=false the key is
    * (host, sanitized title): same-titled articles on different hosts
    * crawl independently (the multi-host-safe mode), while same-host
    * sanitize collisions still conflate as the reference does. */
  private def crawledKey(url: org.apache.spark.sql.Column, title: org.apache.spark.sql.Column) = {
    val t = replace(replace(title, lit(":"), lit("-")), lit("/"), lit("--"))
    if (cfg.fidelityF4) t
    else concat_ws("", graft.expressions.UrlExpressions.host_of(url), t)
  }

  /** Crash-consistency for the docs↔metrics commit pair: each epoch
    * commits docs THEN its metrics rows; a crash between the two
    * leaves the final docs commit un-metered forever (resume's
    * anti-join skips the committed rows, so they are never re-parsed
    * and re-metered — the metrics-sum ≡ docs-count invariant would
    * break permanently). On run start, backfill one aggregate metrics
    * row (partition = −1 marks a backfill, per-partition detail is
    * unrecoverable without a refetch) per un-metered docs commit,
    * pairing commits by order and taking the count from the docs
    * commit's lineage. */
  private def reconcileMetrics(): Unit = {
    val docsCommits = (1 to docs.currentVersion).map(docs.lineageAt)
      .filter(_.startsWith("leafs epoch="))
    val nMetric = (1 to leafMetrics.currentVersion).map(leafMetrics.lineageAt)
      .count(_.startsWith("leaf_metrics epoch="))
    docsCommits.drop(nMetric).foreach { lin =>
      val ep = lin.stripPrefix("leafs epoch=").takeWhile(_ != ' ').toInt
      val n = lin.split("n=").last.trim.toLong
      leafMetrics.append(Seq((ep, -1, n)).toDF("epoch", "partition", "parsed"),
        s"leaf_metrics epoch=$ep backfill", coalesceTo = 1)
    }
  }

  /** Crawl all articles in `work` (url, title) not yet in docs, in
    * seq-ordered EPOCHS with one atomic docs-table commit per epoch
    * (ST2/S9, `zhwiki_leafs.py:70-88`: the reference commits every
    * THREADS*4 items and resumes from the epoch file). A crash loses at
    * most the in-flight epoch; the next run's anti-join resumes at doc
    * granularity — strictly finer than the reference's epoch file.
    * `maxEpochs` caps the epochs processed this call (tests use it to
    * simulate a mid-list kill). Returns docs parsed this call. */
  def run(work: DataFrame, maxEpochs: Int = Int.MaxValue): Long = {
    reconcileMetrics()
    val pending =
      if (docs.isEmpty) work
      else work.join(
        docs.read()
          .select(crawledKey(col("doc_id"), col("title")).as("__ck")).distinct(),
        crawledKey(work("url"), work("title")) === col("__ck"), "left_anti")

    // optional priority column (get_pri_leaves analog): priority items
    // sort first so they land in the earliest epochs
    val hasPri = work.columns.contains("priority")
    val ordCols =
      if (hasPri) Seq(col("priority"), col("url"), col("title"))
      else Seq(col("url"), col("title"))
    // intra-run F4 fidelity: the reference checks the crawled key per
    // item sequentially IN WORK ORDER, so of two same-run items whose
    // titles sanitize to the same directory only the first is fetched
    // (the r2 build reproduced the quirk only across runs)
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(crawledKey(col("url"), col("title"))).orderBy(ordCols: _*)

    // deterministic work order → seq via sorted zipWithIndex (two narrow
    // passes, no single-partition window); persisted so the per-epoch
    // range filters don't recompute the anti-join
    val seqd = pending
      .select(col("url") +: col("title") +:
        (if (hasPri) Seq(col("priority")) else Nil): _*)
      .withColumn("__rn", row_number().over(wk))
      .filter(col("__rn") === 1)
      .orderBy(ordCols: _*)
      .select("url", "title")
      .as[(String, String)]
      .rdd.zipWithIndex()
      .map { case ((url, title), i) => (url, title, i) }
      .toDF("url", "title", "seq")
      .persist()
    val total = seqd.count()
    val epochSize = math.max(1, cfg.leafEpochSize).toLong

    val (st, rb, sf) = (store, cfg.robots, cfg.saltFactor)
    val parseFn = fetchParse(st, rb) _
    var parsedTotal = 0L
    var start = 0L
    var epoch = 0
    while (start < total && epoch < maxEpochs) {
      val parsed = seqd
        .filter(col("seq") >= start && col("seq") < start + epochSize)
        .select("url", "title")
        .as[(String, String)]
        .repartition(nPart, FrontierEngine.saltedPartitionKey(col("url"), sf))
        .as[(String, String)]
        .mapPartitions(parseFn)
      // persist: count + append must not re-run the fetch+parse stage
      val df = parsed.toDF().persist()
      // materialize via the per-partition metric pass (one job), like
      // the frontier's fetch metrics; parsed counts only successful
      // docs so the metrics-sum ≡ docs-count invariant holds
      val metricRows = df
        .groupBy(spark_partition_id().as("partition"))
        .agg(
          sum(when(col("doc").isNotNull, 1L).otherwise(0L)).as("parsed"),
          sum(when(col("doc").isNull, 1L).otherwise(0L)).as("failed"))
        .collect()
        .map(r => (epoch, r.getInt(0), r.getLong(1), r.getLong(2)))
      val n = metricRows.map(_._3).sum
      if (n > 0) {
        docs.append(df.filter(col("doc").isNotNull).select("doc.*"),
          s"leafs epoch=$epoch n=$n", coalesceTo = cfg.appendFiles)
        leafMetrics.append(
          metricRows.map(m => (m._1, m._2, m._3)).toSeq.toDF("epoch", "partition", "parsed"),
          s"leaf_metrics epoch=$epoch", coalesceTo = 1)
      }
      val nFailed = metricRows.map(_._4).sum
      if (nFailed > 0)
        leafFailures.append(df.filter(col("doc").isNull).select("url", "title", "error"),
          s"leaf_failures epoch=$epoch n=$nFailed", coalesceTo = 1)
      df.unpersist()
      // storm guard (see CrawlConfig.maxQuarantineFrac): failures are
      // already committed above, so the audit trail survives the abort
      if (nFailed >= cfg.quarantineMinFails && (n + nFailed) > 0 &&
          nFailed.toDouble / (n + nFailed) > cfg.maxQuarantineFrac)
        throw new IllegalStateException(
          s"quarantine storm: $nFailed of ${n + nFailed} parses threw in " +
            s"epoch $epoch — systemic parser failure, not poisoned pages")
      parsedTotal += n
      start += epochSize
      epoch += 1
    }
    seqd.unpersist()
    // end-of-run compaction: a long crawl accumulates appendFiles ×
    // epochs files and the next run's crawled-check anti-join re-reads
    // them all; rewrite to size-targeted files (content unchanged, so
    // resume/metrics pairing is unaffected — compaction lineage does
    // not match the "leafs epoch=" commit prefix reconcileMetrics
    // counts)
    if (cfg.compactEvery > 0 && parsedTotal > 0) {
      docs.compact(cfg.compactTargetBytes, "compact end-of-run")
      leafMetrics.compact(cfg.compactTargetBytes, "compact end-of-run")
      ()
    }
    parsedTotal
  }

  /** Media second stage (X9+S11, `zhwiki_leafs.py:1455-1502`): image
    * spans → fetch the image's FILE PAGE → resolve the real media URL
    * from its `.fullMedia p a` anchor (the reference's second page
    * fetch) → download bytes (≤10 retries there; the synthetic store is
    * deterministic so one attempt decides) → media table with the
    * PAYLOAD as a binary column (the reference stores the bytes on
    * disk). Failures land as status='failed' rows — the pic_remain.csv
    * analog (`zhwiki_leafs.py:1498-1502`). */
  def fetchMedia(): Long = {
    val imgs = docs.read()
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "image")
      .select(col("doc_id"), col("s.media_ref").as("wiki_url"))
      .dropDuplicates("doc_id", "wiki_url")

    val st = store
    val fetched = imgs.as[(String, String)].mapPartitions { it =>
      it.map { case (docId, wikiUrl) =>
        st.fetch(wikiUrl).flatMap(PageParser.resolveFullMedia) match {
          case Some((mediaUrl, title)) =>
            val bytes = st.fetchMediaBytes(mediaUrl)
            (docId, wikiUrl, Option(mediaUrl), Option(title), bytes,
              bytes.map(_.length).getOrElse(0),
              if (bytes.isDefined) "ok" else "failed")
          case None =>
            (docId, wikiUrl, None: Option[String], None: Option[String],
              None: Option[Array[Byte]], 0, "no_file_page")
        }
      }
    }.toDF("doc_id", "wiki_url", "media_url", "title", "payload", "n_bytes", "status")
      .persist() // count + append must not run the byte fetch twice
    val n = fetched.count()
    if (n > 0) media.append(fetched.coalesce(cfg.appendFiles), s"media n=$n")
    fetched.unpersist()
    n
  }
}
