package graft.html

import org.scalatest.funsuite.AnyFunSuite
import graft.crawl.{PageStore, WebSpec}

class HtmlSpec extends AnyFunSuite {

  test("scanner: nesting, attrs, text, classes, entities") {
    val doc = HtmlScanner.parse(
      """<div id="a" class="x y"><p>he&amp;llo <b>w</b></p><img src="s" alt="t"/></div>tail""")
    val div = doc.findById("div", "a").get
    assert(div.classes == Set("x", "y"))
    assert(div.text == "he&llo w")
    val img = div.findByTag("img").head
    assert(img.attr("src").contains("s") && img.attr("alt").contains("t"))
    assert(doc.children.last == HtmlScanner.HText("tail"))
  }

  test("scanner: strippedStrings and findAll order") {
    val doc = HtmlScanner.parse("""<ul><li> a </li><li><a href="x">b</a></li></ul>""")
    val lis = doc.findByTag("li")
    assert(lis.map(_.text.trim) == Vector("a", "b"))
  }

  test("category extractor: emission order + sections (zhwiki_all.py:141-189)") {
    val store = new PageStore(WebSpec(nCats = 10, nArticles = 12, withBlocked = true))
    // category 0: subcats 1,2,3 (+ maybe cross) + blocked li + articles
    val html = store.categoryHtml(0, 1)
    val links = CategoryExtractor.extract("https://zh.wikipedia.org", html)
    val subcats = links.filter(_.section == CategoryExtractor.Subcat)
    val pages = links.filter(_.section == CategoryExtractor.Page)
    assert(subcats.exists(_.url == PageStore.BlockedUrl))
    assert(subcats.map(_.emitIdx) == subcats.map(_.emitIdx).sorted)
    // pages come after all subcats
    assert(pages.map(_.emitIdx).min > subcats.map(_.emitIdx).max)
    assert(pages.forall(_.isleaf == 1) && subcats.forall(_.isleaf == 0))
  }

  test("category extractor: pagination anchor emits isleaf=0 next-page row") {
    val store = new PageStore(WebSpec(nCats = 40, nArticles = 60))
    val paged = (0 until 40).find(store.hasPagination).get
    val links = CategoryExtractor.extract("https://x", store.categoryHtml(paged, 1))
    val next = links.filter(_.section == CategoryExtractor.PageNext)
    assert(next.size == 1)
    assert(next.head.url == s"https://x/wiki/Category:K${paged}_p2")
    assert(next.head.isleaf == 0)
  }

  test("category extractor: P9 redlink (页面不存在 title) dropped from articles") {
    val store = new PageStore(WebSpec(nCats = 40, nArticles = 60))
    val red = (0 until 40).find(c => store.hasRedlink(c) && !store.isMissing(c)).get
    val html = store.categoryHtml(red, 1)
    assert(html.contains("页面不存在"), "fixture must emit a redlink li")
    val links = CategoryExtractor.extract("https://x", html)
    assert(links.forall(l => !l.title.contains("页面不存在")),
      "redlink must not be emitted")
    assert(links.forall(l => !l.url.contains("redlink=1")))
    // emission indices stay contiguous (dropped links consume no idx)
    assert(links.map(_.emitIdx) == links.indices.toVector)
  }

  test("page parser: X9 fullMedia resolution (zhwiki_leafs.py:1465-1474)") {
    val store = new PageStore(WebSpec())
    val html = store.fileHtml("Img5_0.jpg")
    val Some((mediaUrl, title)) = PageParser.resolveFullMedia(html)
    assert(mediaUrl == "https://upload.graft.example/media/Img5_0.jpg")
    assert(title == "Img5_0.jpg")
    // a page without a fullMedia div resolves to None
    assert(PageParser.resolveFullMedia("<html><body><p>x</p></body></html>").isEmpty)
  }

  test("page parser: spans in canonical order with offsets") {
    val store = new PageStore(WebSpec(nCats = 10, nArticles = 30))
    val base = "https://zh.wikipedia.org"
    // find an article with every feature (toc XOR enwiki by parity, so
    // just assert per-article internal consistency across a few)
    (0 until 10).foreach { a =>
      val parsed = PageParser.parse(s"$base/wiki/A$a", base, store.articleHtml(a)).get
      val spans = parsed.spans
      assert(spans.map(_.offset) == spans.indices.toVector)
      assert(spans.head.kind == "text")
      assert(parsed.firstPar.nonEmpty)
      // zh-hans conversion applied (generator emits 國/歷 which map)
      assert(!parsed.firstPar.contains("國"))
      // cite_note anchor and sup skipped
      assert(!parsed.firstPar.contains("[1]") && !parsed.firstPar.contains("note"))
      // image dedup first-wins
      val imgRefs = spans.filter(_.kind == "image").map(_.media_ref)
      assert(imgRefs.distinct == imgRefs)
      // kind ordering: text < toc < image < thumb < info < link
      val order = Map("text" -> 0, "toc" -> 1, "image" -> 2, "thumb" -> 3, "info" -> 4, "link" -> 5)
      val ks = spans.map(s => order(s.kind))
      assert(ks == ks.sorted)
    }
  }

  test("page parser: thumbs join urls with || (zhwiki_leafs.py:205)") {
    val store = new PageStore(WebSpec(nCats = 10, nArticles = 30))
    val base = "https://x"
    val withThumb = (0 until 30).find { a =>
      PageParser.parse(s"$base/wiki/A$a", base, store.articleHtml(a)).get.thumbs.nonEmpty
    }.get
    val t = PageParser.parse(s"$base/wiki/A$withThumb", base, store.articleHtml(withThumb)).get.thumbs.head
    assert(t._2.contains("||"))
    assert(t._1 == "圖頭" && t._3.startsWith("說明"))
  }

  test("infobox: caption + rows variant produces stable ordered JSON") {
    val store = new PageStore(WebSpec(nCats = 10, nArticles = 60))
    val base = "https://zh.wikipedia.org"
    val a = (0 until 60).find(a => {
      val h = store.articleHtml(a)
      h.contains("<caption>")
    }).get
    val parsed = PageParser.parse(s"$base/wiki/A$a", base, store.articleHtml(a)).get
    val json = parsed.infoJson.get
    assert(json.contains(s""""條目A$a""""))
    assert(json.contains("\"名稱\""))
    // br split into two list entries
    assert(json.contains("值甲") && json.contains("值乙"))
    // ul li items recorded
    assert(json.contains("項目一"))
    // link resolved to absolute
    assert(json.contains(base + "/wiki/A"))
    // empty leaves cleaned: no  "list": [] anywhere
    assert(!json.contains("\"list\": []"))
  }

  test("infobox: nested td table merges via our_merge_dict (F11)") {
    val store = new PageStore(WebSpec(nCats = 10, nArticles = 60))
    val base = "https://zh.wikipedia.org"
    val a = (0 until 60).find(a => store.articleHtml(a).contains("內鍵一")).get
    val parsed = PageParser.parse(s"$base/wiki/A$a", base, store.articleHtml(a)).get
    val json = parsed.infoJson.get
    // inner-table keys merged into the outer td's dict (repeat-suffix
    // semantics of our_merge_dict), inline text kept alongside
    assert(json.contains("\"主欄\""))
    assert(json.contains("\"內鍵一\"") && json.contains("內值一"))
    assert(json.contains("\"內鍵二\"") && json.contains("內值二"))
    assert(json.contains("外層文字"))
    assert(json.contains("\"尾鍵\"") && json.contains("尾值"))
  }

  test("infobox: th-only levels + bullet third key variant") {
    val store = new PageStore(WebSpec(nCats = 10, nArticles = 60))
    val base = "https://zh.wikipedia.org"
    val a = (0 until 60).find(a => store.articleHtml(a).contains("• 子項")).get
    val parsed = PageParser.parse(s"$base/wiki/A$a", base, store.articleHtml(a)).get
    val json = parsed.infoJson.get
    assert(json.contains(s""""標題A$a"""")) // first key
    assert(json.contains("\"分區\""))        // background second key
    assert(json.contains("\"• 子項\""))      // bullet third key
    assert(json.contains("內容一") && json.contains("內容二"))
  }

  // ---- X7 td-as-key special cases (`zhwiki_leafs.py:1160-1327`) ----

  private val Base = "https://zh.wikipedia.org"
  private def parseBox(html: String): InfoboxParser.IDict = {
    val table = HtmlScanner.parse(html).findFirst(_.name == "table").get
    InfoboxParser.parse(s"$Base/wiki/X", Base, table)
  }
  private def sub(d: InfoboxParser.IDict, k: String): InfoboxParser.IDict =
    d(k).asInstanceOf[InfoboxParser.IDict]
  private def listOf(d: InfoboxParser.IDict, k: String): Seq[String] =
    d(k).asInstanceOf[InfoboxParser.IList].items.toSeq

  test("infobox: mergedrow rows — 2-td first-td keys, 1-td <b> second key (09V/浊水溪 shapes)") {
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>河流</th></tr>
         <tr><th style="background:#ccf">水文</th></tr>
         <tr class="mergedrow"><td>起點</td><td>山區值</td></tr>
         <tr class="mergedrow"><td><b>支流</b></td></tr>
         <tr class="mergedrow"><td>左支</td><td><a href="/wiki/A1" title="溪">溪一</a></td></tr>
         </tbody></table>""")
    val first = sub(d, "河流")
    val shuiwen = sub(first, "水文")
    // mergedrow 2-td: first td becomes a third key under the open bg
    // second key; its VALUE td attaches at the second level because the
    // mergedrow branch does not set td_to_third_key (reference `:1285-1311`
    // quirk, attach condition `:1358`)
    assert(shuiwen.keys.contains("起點"))
    assert(listOf(sub(shuiwen, "td_content"), "list") == Seq("山區值"))
    // mergedrow single td with <b>: a NEW second key
    val zhiliu = sub(first, "支流")
    assert(zhiliu.keys.contains("左支"))
    assert(listOf(sub(zhiliu, "td_content"), "links") == Seq(s"$Base/wiki/A1"))
  }

  test("infobox: direct-child <b> / span.nowrap 2-td rows open third keys (09V/北美水獺 shapes)") {
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>艦級</th></tr>
         <tr><th style="background:#dde">概況</th></tr>
         <tr><td><b>建造者</b></td><td>船廠值</td></tr>
         <tr><td><span class="nowrap">服役年</span></td><td>1989年</td></tr>
         </tbody></table>""")
    val gaikuang = sub(sub(d, "艦級"), "概況")
    // the <b>-keyed branch DOES set td_to_third_key, so the value td
    // attaches under the third key (unlike the mergedrow quirk above)
    assert(listOf(sub(sub(gaikuang, "建造者"), "td_content"), "list") == Seq("船廠值"))
    assert(listOf(sub(sub(gaikuang, "服役年"), "td_content"), "list") == Seq("1989年"))
  }

  test("infobox: #f0f0f0-background table keys 2-td rows on their first td (1,3-丙磺酸内酯 shape)") {
    val d = parseBox(
      """<table class="infobox" style="background-color:#f0f0f0"><tbody>
         <tr><th>性質</th><td>無色液體</td></tr>
         <tr><td>熔點</td><td>-31 °C</td></tr>
         <tr><td>沸點</td><td>180 °C</td></tr>
         </tbody></table>""")
    val xz = sub(sub(d, "table_content"), "性質")
    assert(listOf(sub(xz, "td_content"), "list") == Seq("無色液體"))
    assert(listOf(sub(sub(xz, "熔點"), "td_content"), "list") == Seq("-31 °C"))
    assert(listOf(sub(sub(xz, "沸點"), "td_content"), "list") == Seq("180 °C"))
  }

  test("infobox: #cddeff bold td and single bold-background td open second keys (北京市/军委 shapes)") {
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>城市</th></tr>
         <tr><td style="text-align:center; background-color:#cddeff; font-weight:bold">市象徵</td></tr>
         <tr><th>市花</th><td>梅花</td></tr>
         <tr><td style="background:#eee; text-align:center"><b>主要領導</b></td></tr>
         <tr><th>市長</th><td>李甲</td></tr>
         </tbody></table>""")
    val first = sub(d, "城市")
    // #cddeff bold td → second key with background semantics: the next
    // th+td row opens a THIRD key under it
    val sym = sub(first, "市象徵")
    assert(listOf(sub(sub(sym, "市花"), "td_content"), "list") == Seq("梅花"))
    // single centered bold-background td → a fresh second key
    val lead = sub(first, "主要領導")
    assert(listOf(sub(sub(lead, "市長"), "td_content"), "list") == Seq("李甲"))
  }
}
