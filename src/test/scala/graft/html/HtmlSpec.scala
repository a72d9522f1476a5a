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

  test("infobox: navbar-mini div skipped outright (zhwiki_leafs.py:368-372)") {
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>頭</th></tr>
         <tr><td>正文<div class="plainlinks hlist navbar mini"><a href="/wiki/Template:X" title="查">查</a></div></td></tr>
         </tbody></table>""")
    val json = InfoboxParser.toJson(d)
    assert(json.contains("正文"))
    assert(!json.contains("Template:X") && !json.contains("查"))
  }

  test("infobox: direct NavFrame — NavHead key, li walk, nested table, ori-title quirk (zhwiki_leafs.py:373-473)") {
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>頭</th></tr>
         <tr><th style="background:#ddd">分區</th></tr>
         <tr><td><div class="NavFrame"><div class="NavHead" style="background:#eee; text-align:center">路線</div>
         <ul class="NavContent">
         <li>甲線<br/>乙線</li>
         <li><div class="plainlist">丙線<a href="/wiki/Alpha_Beta" title="x">字</a></div></li>
         <li><table><tbody><tr><th>內</th><td>值</td></tr></tbody></table></li>
         </ul></div></td></tr>
         </tbody></table>""")
    val first = sub(d, "頭")
    // NavHead has background + text-align:center → should_under_first_key
    // AND is_table_th_background → the td attaches at the FIRST level
    // (head "NavFrame") even though background second key 分區 is open
    val nav = sub(first, "NavFrame")
    val lu = sub(nav, "路線")
    assert(listOf(lu, "list") == Seq("甲線", "乙線", "丙線字"))
    assert(listOf(lu, "links") == Seq(s"$Base/wiki/Alpha_Beta"))
    // the reference extends links_ori_title with links_TITLE here (quirk)
    assert(listOf(lu, "links_title") == Seq("字"))
    assert(listOf(lu, "links_ori_title") == Seq("字")) // NOT Alpha_Beta
    // nested li table merged via get_table_info_3 under the nav key
    // (a th+td table roots at table_content inside get_table_info_3)
    val inner = sub(sub(sub(lu, "table_content"), "內"), "td_content")
    assert(listOf(inner, "list") == Seq("值"))
  }

  test("infobox: descendant NavFrames — dedup _2 keys, display:none skip (zhwiki_leafs.py:561-610)") {
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>頭</th></tr>
         <tr><td><div class="wrap"><div class="NavFrame"><div class="NavHead">區</div>
         <ul class="NavContent"><li>甲<a href="/wiki/Alpha_Beta" title="x">字</a></li></ul></div>
         <div class="NavFrame"><div class="NavHead">區</div>
         <ul class="NavContent"><li>乙</li></ul></div></div></td></tr>
         <tr><td><div style="display:none" class="wrap2"><div class="NavFrame"><div class="NavHead">隱藏</div>
         <ul class="NavContent"><li>丙</li></ul></div></div></td></tr>
         </tbody></table>""")
    val first = sub(d, "頭")
    val box = sub(first, "td_content")
    assert(listOf(sub(box, "區"), "list") == Seq("甲字"))
    // the descendant branch extends ori with the REAL ori titles
    assert(listOf(sub(box, "區"), "links_ori_title") == Seq("Alpha_Beta"))
    assert(listOf(sub(box, "區_2"), "list") == Seq("乙"))
    // display:none container skipped entirely; its empty td_content leaf
    // is dropped by clean_blank
    assert(!InfoboxParser.toJson(d).contains("隱藏"))
    assert(!InfoboxParser.toJson(d).contains("丙"))
  }

  test("infobox: width-50% p opens a middle key (zhwiki_leafs.py:475-479, 1964年巴西政变)") {
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>頭</th></tr>
         <tr><th>參戰方</th><td style="width: 50%"><p>同盟<a href="/wiki/S1" title="s">方</a></p>部隊甲<br/>部隊乙</td></tr>
         </tbody></table>""")
    val leaf = sub(sub(sub(d, "頭"), "參戰方"), "td_content")
    val mid = sub(leaf, "同盟方")
    assert(listOf(mid, "list") == Seq("部隊甲", "部隊乙"))
    assert(listOf(sub(mid, "th_links"), "links") == Seq(s"$Base/wiki/S1"))
  }

  test("infobox: street-address span builds b-keyed sub-dicts (zhwiki_leafs.py:504-547)") {
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>頭</th></tr>
         <tr><th>地址</th><td><span class="street-address">前文<b>總部</b>街一號<a href="/wiki/S2" title="s">市</a></span></td></tr>
         </tbody></table>""")
    val leaf = sub(sub(sub(d, "頭"), "地址"), "td_content")
    // text before the first <b> lands in the outer list
    assert(listOf(leaf, "list") == Seq("前文"))
    val hq = sub(leaf, "總部")
    assert(listOf(hq, "list") == Seq("街一號市"))
    assert(listOf(hq, "links") == Seq(s"$Base/wiki/S2"))
  }

  test("infobox: first-content span with <b> names the head (zhwiki_leafs.py:548-549)") {
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>頭</th></tr>
         <tr><td><span class="h"><b>格言</b></span>自由之城</td></tr>
         </tbody></table>""")
    val leaf = sub(sub(d, "頭"), "格言")
    assert(listOf(leaf, "list") == Seq("自由之城"))
  }

  test("infobox: single-tr keyless table → table_td_N walk, toccolours under-first (zhwiki_leafs.py:611-768)") {
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>頭</th></tr>
         <tr><th style="background:#ccc">概況</th></tr>
         <tr><td><table class="toccolours"><tbody><tr>
         <td><div class="w"><p><b>北段</b>甲站<br/>乙站</p><ul><li>支一</li><li>支二</li></ul></div></td>
         <td>散文<br/>續文<img src="//upload.x/i.png" alt="圖"/></td>
         </tr></tbody></table></td></tr>
         </tbody></table>""")
    val first = sub(d, "頭")
    // toccolours → should_under + is_table_th_background → td attaches
    // at the FIRST level despite the open background second key
    val box = sub(first, "td_content")
    val td1 = sub(box, "table_td_1")
    val bei = sub(td1, "北段")
    // the ul after the <b> REUSES the open table_b key (`:686` guard
    // only mints table_ul_1 when no b key is open)
    assert(listOf(bei, "list") == Seq("甲站", "乙站", "支一", "支二"))
    val td2 = sub(box, "table_td_2")
    assert(listOf(td2, "list") == Seq("散文", "續文"))
    assert(listOf(td2, "links") == Seq("https://upload.x/i.png"))
    assert(listOf(td2, "links_title") == Seq("圖"))
  }

  test("infobox: single-tr table ul without open b key mints table_ul_1 (zhwiki_leafs.py:686-695)") {
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>頭</th></tr>
         <tr><td><table><tbody><tr>
         <td><div class="w"><ul><li>項甲</li></ul></div></td>
         </tr></tbody></table></td></tr>
         </tbody></table>""")
    val box = sub(sub(d, "頭"), "td_content")
    assert(listOf(sub(sub(box, "table_td_1"), "table_ul_1"), "list") == Seq("項甲"))
  }

  test("infobox: nested th/td table keys via check_repeat_key + th-background under-first (zhwiki_leafs.py:769-783)") {
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>頭</th></tr>
         <tr><th style="background:#ccc">分區</th></tr>
         <tr><td>位於<table><tbody>
         <tr><th style="background:#eef">位置</th></tr>
         <tr><th>校區</th><td>東區</td></tr>
         </tbody></table></td></tr>
         </tbody></table>""")
    val first = sub(d, "頭")
    // nested table's first-tr th has a background style →
    // should_under + is_table_th_background → first-level attach
    val box = sub(first, "td_content")
    assert(listOf(sub(sub(sub(box, "位置"), "校區"), "td_content"), "list") == Seq("東區"))
    // the inline text around the table still accumulates into the td leaf
    assert(listOf(box, "list") == Seq("位於"))
  }

  test("infobox: sole div with direct <b> — head override + 网站 under-first interplay (zhwiki_leafs.py:841-884)") {
    // NOTE: a NavFrame-classed inner div would route the td to the
    // descendant-NavFrames branch first (`:561` precedes `:841` in the
    // elif chain), so the '\n' quirk inside this branch is unreachable
    // in the reference too; the fixture uses a plain inner div.
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>頭</th></tr>
         <tr><th style="background:#ccc">分區</th></tr>
         <tr><td><div class="w"><b>官方网站</b>前段<div class="x">次段</div></div></td></tr>
         </tbody></table>""")
    val first = sub(d, "頭")
    // 网站 in the <b> head → should_under_first_key; but NO
    // is_table_th_background and a background second key is open, so
    // the (shouldUnder && !secondKeyBackground) disjunct fails and it
    // attaches under 分區 — the reference's exact condition interplay
    val leaf = sub(sub(first, "分區"), "官方网站")
    assert(listOf(leaf, "list") == Seq("前段次段"))
  }

  test("infobox: 封面图片 two-div shape + sole-div two-img shouldUnder (zhwiki_leafs.py:341-352)") {
    val d = parseBox(
      """<table class="infobox"><tbody>
         <tr><th>頭</th></tr>
         <tr><td><div class="c1"><img src="//u.x/a.png" alt="a"/></div><div class="c2">說明文</div></td></tr>
         </tbody></table>""")
    val first = sub(d, "頭")
    val cover = sub(first, "封面图片")
    // the generic fallthrough collects text and <a> links only — a bare
    // <img> inside a plain div contributes nothing (reference `:905`
    // find_all('a')), so only the caption text survives
    assert(listOf(cover, "list") == Seq("說明文"))
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
