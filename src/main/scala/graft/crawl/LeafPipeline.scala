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

  /** Task-side: fetch+parse one work item (standalone for clean closures). */
  def fetchParse(store: PageStore, robots: RobotsPolicy)(
      it: Iterator[(String, String)]): Iterator[DocRow] =
    it.flatMap { case (url, title) =>
      val html = if (!robots.allowed(url)) None else store.fetch(url)
      html.flatMap { h =>
        PageParser.parse(url, originOf(url), h).map { p =>
          DocRow(url, title, url, p.enwikiUrl, p.pageHtml,
            p.spans.map(s => SpanRow(s.kind, s.text, s.media_ref, s.offset)))
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
}

final class LeafPipeline(spark: SparkSession, store: PageStore, cfg: CrawlConfig) {
  import spark.implicits._
  import LeafPipeline._

  val docs = new IceLite(spark, s"${cfg.workDir}/docs")
  val media = new IceLite(spark, s"${cfg.workDir}/media")

  private val nPart =
    if (cfg.fetchPartitions > 0) cfg.fetchPartitions
    else spark.conf.get("spark.sql.shuffle.partitions").toInt

  /** Crawl all articles in `work` (url, title) not yet in docs. */
  def run(work: DataFrame): Long = {
    val pending =
      if (docs.isEmpty) work
      else work.join(docs.read().select(col("doc_id").as("url")), Seq("url"), "left_anti")

    val (st, rb, sf) = (store, cfg.robots, cfg.saltFactor)
    val parseFn = fetchParse(st, rb) _
    val parsed = pending
      .select("url", "title")
      .as[(String, String)]
      .repartition(nPart, FrontierEngine.saltedPartitionKey(col("url"), sf, nPart))
      .as[(String, String)]
      .mapPartitions(parseFn)

    // persist: count + append must not re-run the fetch+parse stage
    val df = parsed.toDF().persist()
    val n = df.count()
    if (n > 0) docs.append(df, s"leafs n=$n")
    df.unpersist()
    n
  }

  /** Media second stage: image spans → byte fetch → media table. */
  def fetchMedia(): Long = {
    val imgs = docs.read()
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "image")
      .select(col("doc_id"), col("s.media_ref").as("wiki_url"))
      .dropDuplicates("doc_id", "wiki_url")

    val st = store
    val fetched = imgs.as[(String, String)].mapPartitions { it =>
      it.map { case (docId, wikiUrl) =>
        // ≤10 retries (`zhwiki_leafs.py:1487`); the synthetic store is
        // deterministic so one attempt decides
        val bytes = st.fetchMediaBytes(wikiUrl)
        (docId, wikiUrl, bytes.map(_.length).getOrElse(0),
          if (bytes.isDefined) "ok" else "failed")
      }
    }.toDF("doc_id", "wiki_url", "n_bytes", "status")
    val n = fetched.count()
    if (n > 0) media.append(fetched, s"media n=$n")
    n
  }
}
