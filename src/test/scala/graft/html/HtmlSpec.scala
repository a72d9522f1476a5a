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
}
