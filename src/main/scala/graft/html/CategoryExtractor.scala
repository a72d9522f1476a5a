package graft.html

import HtmlScanner._

/** X1: category-page link extraction, faithful to the frontier loop
  * body (`zhwiki_all.py:141-189`, live clone `:449-496`).
  *
  * Emission order per page: subcategory lis (DOM order) → subcategory
  * next-page anchor → article lis → articles next-page anchor. Each
  * emitted row records its section so the crawl engine can apply the
  * reference's per-section rules (blocklist only for SUBCAT; J2 row
  * dedup only for PAGE; enqueue for everything except PAGE).
  */
object CategoryExtractor {

  sealed trait Section
  case object Subcat extends Section
  case object SubcatNext extends Section
  case object Page extends Section
  case object PageNext extends Section

  /** One discovered frontier row candidate, in emission order. */
  final case class Link(
      url: String,
      title: String,
      isleaf: Int,
      section: Section,
      emitIdx: Int
  )

  /** P9: MediaWiki missing-page (redlink) marker — anchors whose title
    * attr matches are dropped from article emission, mirroring
    * `re.search("页面不存在", cur.attrs["title"])` (`zhwiki_all.py:53`,
    * `zhwiki_leafs.py:1527`). */
  private val MissingPageRe = "页面不存在".r

  private def nextPageAnchor(div: HElem): Option[HElem] = {
    // BS4 `find('a', text=re.compile('下一页'))`: anchors whose direct
    // string content matches; fallback regex 下壹頁 (`zhwiki_all.py:158-160`)
    def byText(t: String): Option[HElem] =
      div.findFirst(e => e.name == "a" && e.text.contains(t))
    byText("下一页").orElse(byText("下壹頁"))
  }

  /** Extract all frontier rows from one category page. `base` is the
    * origin prefixed to hrefs (the reference hard-codes
    * 'https://zh.wikipedia.org'; generalized per-host for multi-host
    * synthetic webs). */
  def extract(base: String, html: String): Vector[Link] = {
    val doc = HtmlScanner.parse(html)
    val out = Vector.newBuilder[Link]
    var idx = 0
    def emit(url: String, title: String, isleaf: Int, sec: Section): Unit = {
      out += Link(url, title, isleaf, sec, idx)
      idx += 1
    }

    doc.findById("div", "mw-subcategories").foreach { sub =>
      sub.findByTag("ul").foreach { ul =>
        ul.findByTag("li").foreach { li =>
          li.findFirst(_.name == "a").foreach { a =>
            val href = base + a.attr("href").getOrElse("")
            emit(href, a.attr("title").getOrElse(""), 0, Subcat)
          }
        }
      }
      nextPageAnchor(sub).foreach { a =>
        val href = base + a.attr("href").getOrElse("")
        emit(href, a.attr("title").getOrElse(""), 0, SubcatNext)
      }
    }

    doc.findById("div", "mw-pages").foreach { pages =>
      pages.findByTag("ul").foreach { ul =>
        ul.findByTag("li").foreach { li =>
          li.findFirst(_.name == "a").foreach { a =>
            val title = a.attr("title").getOrElse("")
            if (MissingPageRe.findFirstIn(title).isEmpty) {  // P9 redlink drop
              val href = base + a.attr("href").getOrElse("")
              emit(href, title, 1, Page)
            }
          }
        }
      }
      nextPageAnchor(pages).foreach { a =>
        val href = base + a.attr("href").getOrElse("")
        emit(href, a.attr("title").getOrElse(""), 0, PageNext)
      }
    }
    out.result()
  }
}
