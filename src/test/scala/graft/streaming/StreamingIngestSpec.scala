package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.crawl.{CrawlConfig, FrontierEngine, PageStore, SimCrawler, WebSpec}
import graft.tables.IceLite

/** ST1's streaming half: the batch crawl and a streaming ingest share
  * ONE table format. A crawl whose entire initial state (frontier,
  * seen, queue, crawl-order) arrives through `IceLiteSink` streamed
  * appends — instead of the engine's own batch init() — must produce
  * byte-identical results when the batch supersteps pick it up.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  /** Stream `rows` into `table` through a real Structured Streaming
    * query (MemoryStream → foreachBatch IceLiteSink). */
  private def streamInto[T <: Product : org.apache.spark.sql.Encoder](
      table: IceLite, rows: Seq[T], cols: Seq[String]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[T]
    in.addData(rows: _*)
    val q = IceLiteSink.start(in.toDF().toDF(cols: _*), table,
      java.nio.file.Files.createTempDirectory("ingest_ckpt").toString)
    q.processAllAvailable()
    q.stop()
  }

  test("batch supersteps pick up a stream-ingested bootstrap identically") {
    val spec = WebSpec(nCats = 30, nArticles = 40)
    val store = new PageStore(spec)
    val sim = SimCrawler.crawl(store, Set(graft.crawl.PageStore.BlockedUrl))

    // streamed bootstrap: the four state tables are written ONLY by
    // IceLiteSink streaming appends (exactly-once), shaped like init()
    val dir = tmpDir("ingest")
    val seeds = store.seeds
    streamInto(new IceLite(spark, s"$dir/frontier"),
      seeds.zipWithIndex.map { case ((url, title, pre, isleaf), i) =>
        (url, title, pre, isleaf, -1L, i.toLong)
      },
      Seq("url", "title", "pre_url", "isleaf", "parent_seq", "emit_idx"))
    streamInto(new IceLite(spark, s"$dir/seen"),
      seeds.map(s => Tuple1(s._1)), Seq("url"))
    val qRows = seeds.zipWithIndex.collect { case ((url, _, _, 0), i) => (url, i.toLong) }
    streamInto(new IceLite(spark, s"$dir/crawl_order"),
      qRows.map { case (u, s) => (u, s, 0) }, Seq("url", "seq", "superstep"))
    streamInto(new IceLite(spark, s"$dir/queue"), qRows, Seq("url", "seq"))

    // the batch engine resumes from the streamed state: init() sees a
    // non-empty queue (resume path) and the first superstep derives
    // nextSeq from the streamed data (no nextSeq lineage there)
    val engine = new FrontierEngine(spark, store, CrawlConfig(workDir = dir, useBloom = false))
    engine.run()

    val engRows = engine.frontierOrdered()
      .select("url", "title", "pre_url", "isleaf")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toVector
    assert(engRows == sim.rows.map(r => (r.url, r.title, r.preUrl, r.isleaf)),
      "frontier rows differ from the batch-init oracle")
    assert(engine.seenSet().select("url").collect().map(_.getString(0)).toSet == sim.seen,
      "seen set differs")
    val engOrder = engine.crawlOrder().select("url").collect().map(_.getString(0)).toVector
    assert(engOrder == sim.crawlOrder, "crawl order differs")
  }
}
