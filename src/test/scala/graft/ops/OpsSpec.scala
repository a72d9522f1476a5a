package graft.ops

import graft.SparkSpec
import graft.crawl.{CrawlConfig, FrontierEngine, PageStore, SimCrawler, WebSpec}
import graft.sources.FrontierCsv

/** Library-level ops not covered by the DuckDB oracle: the iterative
  * category closure (J4) and the frontier CSV source/sink parity.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("categoryClosure matches reachable-set BFS on the synthetic frontier") {
    val spec = WebSpec(nCats = 40, nArticles = 60)
    val store = new PageStore(spec)
    val sim = SimCrawler.crawl(store)
    val frontier = sim.rows.map(r => (r.url, r.title, r.preUrl, r.isleaf))
      .toDF("url", "title", "pre_url", "isleaf")

    val seed = store.catUrl(1)
    val closure = Relational.categoryClosure(frontier, Seq(seed))
      .select("url").distinct().as[String].collect().toSet

    // oracle: BFS over the same edge list
    val edges = sim.rows.groupBy(_.preUrl)
    var visited = Set(seed)
    var level = Set(seed)
    var reach = sim.rows.filter(_.url == seed).map(_.url).toSet
    while (level.nonEmpty) {
      val children = level.toSeq.flatMap(u => edges.getOrElse(u, Nil))
      reach ++= children.map(_.url)
      val next = children.filter(_.isleaf == 0).map(_.url).toSet -- visited
      visited ++= next
      level = next
    }
    assert(closure == reach)
  }

  test("pythonQuote column matches the scalar Python-quote semantics") {
    import org.apache.spark.sql.functions.col
    val titles = Seq("中文条目", "A B", "a/b", "x~y", "p+q", "s*t", "A:B?C", "日本-歷史")
    val got = titles.toDF("t")
      .select(FrontierCsv.pythonQuote(col("t")))
      .as[String].collect().toSeq
    assert(got == titles.map(graft.functions.UrlFunctions.quote))
  }

  test("approx_count_distinct monitoring path within 5% of exact") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val approx = Relational.approxDistinctByKey(df)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = Relational.countDistinctByKey(df)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p, s)) =>
      val (pa, sa) = approx(k)
      assert(math.abs(pa - p).toDouble / p < 0.05, s"$k parts: $pa vs $p")
      assert(math.abs(sa - s).toDouble / s < 0.05, s"$k supps: $sa vs $s")
    }
  }

  test("frontier TSV round-trip preserves rows and types") {
    val dir = tmpDir("tsv")
    val df = Seq(
      ("https://x/wiki/A", "标题A", "seed", 1),
      ("https://x/wiki/Category:B", "Category:B", "https://x/wiki/C", 0)
    ).toDF("url", "title", "pre_url", "isleaf")
    FrontierCsv.write(df, s"$dir/out")
    val back = FrontierCsv.read(spark, s"$dir/out")
    assert(back.collect().toSet == df.collect().toSet)
    assert(back.schema("isleaf").dataType.typeName == "integer")
  }

  test("seed-dir source skips named files; title source builds encoded urls") {
    val dir = tmpDir("seeds")
    def writeCsv(name: String, rows: Seq[String]): Unit = {
      val f = new java.io.PrintWriter(s"$dir/$name")
      f.println("url\ttitle\tpre_url\tisleaf")
      rows.foreach(f.println)
      f.close()
    }
    writeCsv("a.csv", Seq("https://x/wiki/A\tA\tseed\t0"))
    writeCsv("skip.csv", Seq("https://x/wiki/S\tS\tseed\t0"))
    val df = FrontierCsv.readSeedDir(spark, dir, Set("skip.csv"))
    assert(df.select("url").as[String].collect().toSeq == Seq("https://x/wiki/A"))

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/titles.txt"),
      "中文条目\n\nPlain\n",
      java.nio.charset.StandardCharsets.UTF_8)
    val titles = FrontierCsv.readTitles(spark, s"$dir/titles.txt", "https://zh.wikipedia.org")
      .as[(String, String)].collect().toMap
    assert(titles("https://zh.wikipedia.org/wiki/%E4%B8%AD%E6%96%87%E6%9D%A1%E7%9B%AE") == "中文条目")
    assert(titles.contains("https://zh.wikipedia.org/wiki/Plain"))
  }
}
