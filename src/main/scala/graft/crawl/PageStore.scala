package graft.crawl

import graft.html.HtmlScanner.escape

/** Deterministic synthetic web (FIXTURES.md §1): a pure function
  * url → html generated from `seed`, standing in for the network (the
  * sandbox has none). Emits exactly the restricted grammar the scanner
  * supports — the id/class vocabulary of the reference's selectors.
  *
  * Graph features: category tree with deterministic branching, cross
  * links (cycles + cross-page duplicate discoveries), in-page duplicate
  * article lis (the J2 quirk), pagination chains (下一页 anchors),
  * missing pages (404), the reference's blocked-category URL, multiple
  * hosts for scaling benches, per-host robots bodies.
  */
final case class WebSpec(
    seed: Long = 42L,
    nCats: Int = 40,
    nArticles: Int = 60,
    nHosts: Int = 1,
    branching: Int = 3,
    articlesPerCat: Int = 4,
    nSeeds: Int = 2,
    withBlocked: Boolean = true,
    robots: RobotsPolicy = RobotsPolicy.allowAll,
    /** Categories forced to 404 regardless of the hash draw (lets a
      * test build the "this page contributes nothing" oracle web). */
    forcedMissingCats: Set[Int] = Set.empty,
    /** Articles whose infobox carries a NavFrame with no NavHead — the
      * reference-faithful fail-fast branch (`zhwiki_leafs.py:383`,
      * InfoboxParser's unguarded `.get`) THROWS on these, standing in
      * for the poisoned pages a real web crawl inevitably fetches. */
    poisonArticles: Set[Int] = Set.empty
) extends Serializable

object PageStore {

  /** Exact blocked-category constant from `zhwiki_all.py:153` (the
    * stroke-count sort category). */
  val BlockedUrl =
    "https://zh.wikipedia.org/wiki/Category:%E4%BD%BF%E7%94%A8%E9%83%A8%E9%A6%96%E7%9A%84%E7%AD%86%E5%8A%83%E6%95%B8%E4%BD%9C%E7%82%BA%E6%8E%92%E5%BA%8F%E9%8D%B5%E5%80%BC%E7%9A%84%E5%88%86%E9%A1%9E"
}

final class PageStore(val spec: WebSpec) extends Serializable {
  import PageStore._

  /** Deterministic 64-bit mix of (seed, s). */
  private def h(s: String): Long = {
    var x = spec.seed ^ 0x9e3779b97f4a7c15L
    s.foreach { c => x = (x ^ c.toLong) * 0xff51afd7ed558ccdL; x ^= (x >>> 33) }
    x & Long.MaxValue
  }

  def hostOfCat(c: Int): String =
    if (spec.nHosts == 1) "zh.wikipedia.org"
    else s"host${c % spec.nHosts}.graft.example"
  def originOfCat(c: Int): String = s"https://${hostOfCat(c)}"

  def catUrl(c: Int, page: Int = 1): String =
    originOfCat(c) + "/wiki/Category:K" + c + (if (page > 1) s"_p$page" else "")
  def catTitle(c: Int): String = s"Category:K$c"
  def articleUrl(c: Int, a: Int): String = originOfCat(c) + "/wiki/A" + a
  def articleTitle(a: Int): String = s"A${a}条目"

  /** Seed categories: roots 0..nSeeds-1 (in-code seed list analog,
    * `zhwiki_all.py:109-122`). Rows shaped like the seed CSV (S3). */
  def seeds: Vector[(String, String, String, Int)] =
    (0 until spec.nSeeds).toVector.map(c => (catUrl(c), catTitle(c), "seed", 0))

  def childCats(c: Int): Seq[Int] = {
    val base = (0 until spec.branching).map(k => c * spec.branching + k + 1)
      .filter(_ < spec.nCats)
    // cross link: cycle/duplicate edge to an earlier or unrelated cat
    val cross = if (h(s"cross$c") % 3 == 0) Seq(((c * 7 + 3) % spec.nCats)) else Seq.empty
    base ++ cross
  }

  def catArticles(c: Int): Seq[Int] =
    (0 until spec.articlesPerCat).map(j => (c * spec.articlesPerCat + j) % spec.nArticles)

  def isMissing(c: Int): Boolean =
    spec.forcedMissingCats(c) || (c != 0 && h(s"missing$c") % 17 == 0)

  def hasPagination(c: Int): Boolean = h(s"page$c") % 4 == 0

  /** In-page duplicate article li (J2 quirk source). */
  def hasInPageDup(c: Int): Boolean = h(s"dup$c") % 5 == 0

  /** Redlink article li (P9 quirk source): a link whose title attr
    * carries the MediaWiki missing-page marker `页面不存在` — the
    * extractor must drop it (`zhwiki_all.py:53`). */
  def hasRedlink(c: Int): Boolean = h(s"red$c") % 6 == 0

  private def li(href: String, title: String): String =
    s"""<li><a href="${escape(href)}" title="${escape(title)}">${escape(title)}</a></li>"""

  /** Category page HTML (subcategories + pages + pagination anchors). */
  def categoryHtml(c: Int, page: Int): String = {
    val sb = new StringBuilder("<html><body>")
    val kids = childCats(c)
    val arts = catArticles(c)
    val paged = hasPagination(c)
    // page 1 carries subcats + first half of articles; page 2 the rest
    val (artsHere, hasNext) =
      if (!paged) (arts, false)
      else if (page == 1) (arts.take(arts.length / 2), true)
      else (arts.drop(arts.length / 2), false)

    if (page == 1 && (kids.nonEmpty || spec.withBlocked)) {
      sb.append("""<div id="mw-subcategories"><ul>""")
      kids.foreach { k => sb.append(li(s"/wiki/Category:K$k", catTitle(k))) }
      if (spec.withBlocked && c == 0 && spec.nHosts == 1) {
        // the blocked category appears as a normal subcat li; its href
        // must resolve to the exact reference constant
        val path = BlockedUrl.stripPrefix("https://zh.wikipedia.org")
        sb.append(li(path, "Category:笔画排序"))
      }
      sb.append("</ul></div>")
    }
    if (artsHere.nonEmpty || hasNext) {
      sb.append("""<div id="mw-pages"><ul>""")
      artsHere.foreach { a => sb.append(li(s"/wiki/A$a", articleTitle(a))) }
      if (hasInPageDup(c) && artsHere.nonEmpty) {
        val a = artsHere.head
        sb.append(li(s"/wiki/A$a", articleTitle(a))) // J2 in-page duplicate
      }
      if (hasRedlink(c) && page == 1) {
        // P9 redlink: title attr carries the missing-page marker
        val a = (c * 31 + 7) % (spec.nArticles + spec.nCats)
        sb.append(li(s"/w/index.php?title=A$a&action=edit&redlink=1",
          s"A$a（页面不存在）"))
      }
      sb.append("</ul>")
      if (hasNext)
        sb.append(
          s"""<a href="/wiki/Category:K${c}_p2" title="${escape(catTitle(c))}">下一页</a>""")
      sb.append("</div>")
    }
    sb.append("</body></html>")
    sb.toString
  }

  /** Article page HTML exercising X2–X7 feature branches by hash. */
  def articleHtml(a: Int): String = {
    val v = h(s"art$a")
    val sb = new StringBuilder("""<html><body><div class="mw-parser-output">""")
    // empty first paragraph to skip, then the real one (X2 branches)
    sb.append("<p>  </p>")
    sb.append(s"""<p>A${a}是一個關於<a href="/wiki/A${(a + 1) % spec.nArticles}" title="x">國家歷史</a>的條目""")
    sb.append(s"""<sup>note</sup><a href="#cite_note-1">[1]</a>，記述東車馬島。</p>""")
    // images (X4) with an in-article duplicate href when v%3==0
    val nImg = 1 + (v % 3).toInt
    sb.append((0 until nImg).map { i =>
      s"""<a class="image" href="/wiki/File:Img${a}_$i.jpg"><img src="//upload.graft/img${a}_$i.png" alt="img$a-$i"/></a>"""
    }.mkString)
    if (v % 3 == 0)
      sb.append(
        s"""<a class="image" href="/wiki/File:Img${a}_0.jpg"><img src="//upload.graft/img${a}_0.png" alt="dup"/></a>""")
    // thumbs (X6)
    if (v % 2 == 0) {
      sb.append("""<div class="thumbinner"><div class="theader">圖頭</div>""")
      sb.append(s"""<a class="image" href="/wiki/File:Th${a}_1.jpg"><img src="//upload.graft/th$a.png" alt="t"/></a>""")
      sb.append(s"""<a class="image" href="/wiki/File:Th${a}_2.jpg"><img src="//upload.graft/th2$a.png" alt="t2"/></a>""")
      sb.append(s"""<div class="thumbcaption">說明A$a</div></div>""")
    }
    sb.append(
      if (spec.poisonArticles(a))
        // NavFrame with NO NavHead: InfoboxParser's reference-faithful
        // unguarded .get throws here (`zhwiki_leafs.py:383`)
        s"""<table class="infobox"><tbody>
            <tr><th>毒A$a</th></tr>
            <tr><td><div class="NavFrame"><ul><li>孤段</li></ul></div></td></tr>
            </tbody></table>"""
      else infoboxHtml(a, v))
    sb.append("</div>") // mw-parser-output
    // TOC (X3) — reference looks it up on the whole soup
    if (v % 2 == 1) {
      sb.append("""<div id="toc" class="toc" aria-labelledby="mw-toc-heading"><ul>""")
      sb.append("""<li><a href="#s1"><span class="tocnumber">1</span> <span class="toctext">歷史</span></a></li>""")
      sb.append("""<li><a href="#s2"><span class="tocnumber">2</span> <span class="toctext">地理</span></a></li>""")
      sb.append("</ul></div>")
    }
    // interlanguage (X5)
    if (v % 2 == 0) {
      sb.append("""<div class="lang-box"><h3 id="p-lang-label">lang</h3><ul>""")
      sb.append(s"""<li class="interwiki-en"><a href="https://en.wikipedia.org/wiki/A$a">English</a></li>""")
      sb.append("</ul></div>")
    }
    sb.append("</body></html>")
    sb.toString
  }

  /** Infobox variants cycling through the restricted branch set
    * (incl. the td-as-key special cases, `zhwiki_leafs.py:1160-1327`,
    * and — r4 — the NavFrame / street-address / table_td / span-head /
    * single-div-b families, `:368-610,611-768,841-884`). */
  private def infoboxHtml(a: Int, v: Long): String = (v % 16) match {
    case 10 => // direct NavFrame: bg+center NavHead → first-level attach
      s"""<table class="infobox"><tbody>
          <tr><th>路網A$a</th></tr>
          <tr><th style="background:#ddd">營運中</th></tr>
          <tr><td><div class="NavFrame"><div class="NavHead" style="background:#eee; text-align:center">主線</div>
          <ul class="NavContent"><li>甲段<br/>乙段</li>
          <li><div class="plainlist">丙段<a href="/wiki/A${(a + 4) % spec.nArticles}" title="站">站鏈</a></div></li>
          </ul></div></td></tr>
          </tbody></table>"""
    case 11 => // street-address span + width-50% p middle key
      s"""<table class="infobox"><tbody>
          <tr><th>機構A$a</th></tr>
          <tr><th>地址</th><td><span class="street-address">郵區<b>總部</b>大道${a}號<a href="/wiki/A${(a + 5) % spec.nArticles}" title="市">城市</a></span></td></tr>
          <tr><th>參戰方</th><td style="width: 50%"><p>同盟<a href="/wiki/A${(a + 6) % spec.nArticles}" title="s">方</a></p>部隊甲<br/>部隊乙</td></tr>
          </tbody></table>"""
    case 12 => // descendant NavFrames: shared head → _2 dedup
      s"""<table class="infobox"><tbody>
          <tr><th>體系A$a</th></tr>
          <tr><td><div class="wrap"><div class="NavFrame"><div class="NavHead">支系</div>
          <ul class="NavContent"><li>系甲<a href="/wiki/A${(a + 7) % spec.nArticles}" title="鏈">鏈一</a></li></ul></div>
          <div class="NavFrame"><div class="NavHead">支系</div>
          <ul class="NavContent"><li>系乙</li></ul></div></div></td></tr>
          </tbody></table>"""
    case 13 => // toccolours single-tr keyless table → table_td_N walk
      s"""<table class="infobox"><tbody>
          <tr><th>幹線A$a</th></tr>
          <tr><th style="background:#ccf">走向</th></tr>
          <tr><td><table class="toccolours"><tbody><tr>
          <td><div class="w"><p><b>北段</b>起站$a<br/>迄站</p><ul><li>支線一</li></ul></div></td>
          <td>沿線說明<br/>續說明<img src="//upload.graft/tt$a.png" alt="線圖"/></td>
          </tr></tbody></table></td></tr>
          </tbody></table>"""
    case 14 => // single-div-b 网站 head + first-content span-with-b head
      s"""<table class="infobox"><tbody>
          <tr><th>公司A$a</th></tr>
          <tr><th style="background:#dde">資料</th></tr>
          <tr><td><div class="w"><b>官方网站</b>example$a.org<div class="x">備用站</div></div></td></tr>
          <tr><td><span class="h"><b>格言</b></span>團結奮進$a</td></tr>
          </tbody></table>"""
    case 15 => // navbar-mini skip + 封面图片 two-div + nested th/td bg table
      s"""<table class="infobox"><tbody>
          <tr><th>學校A$a</th></tr>
          <tr><td><div class="c1"><img src="//upload.graft/cov$a.png" alt="封面"/></div><div class="c2">校景說明</div></td></tr>
          <tr><th style="background:#eed">沿革</th></tr>
          <tr><td>概述<div class="plainlinks hlist navbar mini"><a href="/wiki/Template:Nav" title="查">查</a></div><table><tbody>
          <tr><th style="background:#eef">位置</th></tr>
          <tr><th>校區</th><td>東區$a</td></tr>
          </tbody></table></td></tr>
          </tbody></table>"""
    case 6 => // mergedrow rows: 1-td-with-b second key, 2-td third keys
      s"""<table class="infobox"><tbody>
          <tr><th>河流A$a</th></tr>
          <tr><th style="background:#ccf">水文</th></tr>
          <tr class="mergedrow"><td>起點</td><td>山區值</td></tr>
          <tr class="mergedrow"><td><b>支流</b></td></tr>
          <tr class="mergedrow"><td>左支</td><td><a href="/wiki/A${(a + 1) % spec.nArticles}" title="溪">溪一</a></td></tr>
          </tbody></table>"""
    case 7 => // direct-child <b> and span.nowrap 2-td rows → third keys
      s"""<table class="infobox"><tbody>
          <tr><th>艦級A$a</th></tr>
          <tr><th style="background:#dde">概況</th></tr>
          <tr><td><b>建造者</b></td><td>船廠值</td></tr>
          <tr><td><span class="nowrap">服役年</span></td><td>1989年</td></tr>
          </tbody></table>"""
    case 8 => // #f0f0f0-background table: 2-td rows key on first td
      s"""<table class="infobox" style="background-color:#f0f0f0"><tbody>
          <tr><th>性質</th><td>無色液體</td></tr>
          <tr><td>熔點</td><td>-31 °C</td></tr>
          <tr><td>沸點</td><td>180 °C</td></tr>
          </tbody></table>"""
    case 9 => // centered bold #cddeff second key + single bold-bg td key
      s"""<table class="infobox"><tbody>
          <tr><th>城市A$a</th></tr>
          <tr><td style="text-align:center; background-color:#cddeff; font-weight:bold">市象徵</td></tr>
          <tr><th>市花</th><td>梅花</td></tr>
          <tr><td style="background:#eee; text-align:center"><b>主要領導</b></td></tr>
          <tr><th>市長</th><td>李甲</td></tr>
          </tbody></table>"""
    case 5 => // nested table inside a td (F11 our_merge_dict path)
      s"""<table class="infobox"><tbody>
          <tr><th>主欄</th><td>外層文字<table><tbody>
          <tr><th>內鍵一</th><td>內值一</td></tr>
          <tr><th>內鍵二</th><td>內值二</td></tr>
          </tbody></table></td></tr>
          <tr><th>尾鍵</th><td>尾值</td></tr>
          </tbody></table>"""
    case 0 => "" // no infobox
    case 1 => // caption + th/td rows + ul td
      s"""<table class="infobox"><caption>條目A$a</caption><tbody>
          <tr><th>名稱</th><td>值甲<br/>值乙</td></tr>
          <tr><th>鏈接</th><td><a href="/wiki/A${(a + 2) % spec.nArticles}" title="鄰">鄰居</a>與文字</td></tr>
          <tr><th>列表</th><td><ul><li>項目一</li><li><a href="/wiki/File:F$a.jpg">項目二</a></li></ul></td></tr>
          </tbody></table>"""
    case 2 => // th-only first key + background second key + bullet third
      s"""<table class="infobox"><tbody>
          <tr><th>標題A$a</th></tr>
          <tr><th style="background:#ccf; text-align: center">分區</th></tr>
          <tr><th>• 子項</th><td>內容一</td></tr>
          <tr><th>普通鍵</th><td>內容二</td></tr>
          </tbody></table>"""
    case 3 => // multi-th row + td-only row + b sub-key td
      s"""<table class="infobox"><tbody>
          <tr><th>欄一</th><th>欄二</th></tr>
          <tr><td><b>加粗鍵</b>其後文字<br/>第二行</td></tr>
          <tr><td><span class="wrap">行內<a href="/wiki/A${(a + 3) % spec.nArticles}" title="表鏈">表鏈</a></span></td></tr>
          </tbody></table>"""
    case _ => // first-tr background td first key + img td
      s"""<table class="infobox"><tbody>
          <tr><td style="background:#eef">抬頭A$a</td></tr>
          <tr><th>圖</th><td><img src="//upload.graft/box$a.png" alt="盒圖"/></td></tr>
          <tr><th>空值</th><td>  </td></tr>
          </tbody></table>"""
  }

  /** Media byte "download" (S11 analog): deterministic synthetic bytes
    * keyed by the image page URL; ~1/13 of images fail permanently
    * (the pic_remain.csv path, `zhwiki_leafs.py:1498-1502`). */
  def fetchMediaBytes(wikiUrl: String): Option[Array[Byte]] = {
    val v = h(s"media$wikiUrl")
    if (v % 13 == 0) None
    else {
      val n = 64 + (v % 192).toInt
      val b = new Array[Byte](n)
      var x = v
      (0 until n).foreach { i =>
        x = x * 6364136223846793005L + 1442695040888963407L
        b(i) = (x >>> 56).toByte
      }
      Some(b)
    }
  }

  /** The "network": url → html. None = 404/500 (reference short-circuit
    * P8) or robots-denied (treated identically by the crawl spec). */
  def fetch(url: String): Option[String] = {
    if (!spec.robots.allowed(url)) return None
    if (url == BlockedUrl) return None // never fetched anyway (never enqueued)
    val path = {
      val i = url.indexOf("/wiki/")
      if (i == -1) return None
      url.substring(i + 6)
    }
    if (path.startsWith("Category:K")) {
      val rest = path.stripPrefix("Category:K")
      val (cs, page) = rest.split("_p") match {
        case Array(x)    => (x, 1)
        case Array(x, p) => (x, p.toInt)
      }
      val c = cs.toIntOption.getOrElse(return None)
      if (c < 0 || c >= spec.nCats || isMissing(c)) None
      else Some(categoryHtml(c, page))
    } else if (path.startsWith("File:")) {
      Some(fileHtml(path.stripPrefix("File:")))
    } else if (path.startsWith("A")) {
      path.stripPrefix("A").takeWhile(_.isDigit).toIntOption
        .filter(a => a >= 0 && a < spec.nArticles)
        .map(articleHtml)
    } else None
  }

  /** Image FILE PAGE (X9 fixture): the `.fullMedia p a` anchor carries a
    * protocol-relative href to the real media URL (mirrors the MediaWiki
    * file-description layout the reference resolves,
    * `zhwiki_leafs.py:1465-1474`). */
  def fileHtml(name: String): String =
    s"""<html><body><div class="fullMedia"><p>""" +
      s"""<a href="//upload.graft.example/media/${escape(name)}" title="${escape(name)}">原始文件</a>""" +
      """</p></div></body></html>"""
}
