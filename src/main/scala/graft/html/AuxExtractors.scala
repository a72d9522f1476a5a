package graft.html

import HtmlScanner._

/** X10/X11 — the reference's two dormant extractors, implemented for
  * inventory completeness (they are defined but never called from
  * either `__main__`; SURVEY.md §2 listed them as optional).
  *
  * - `wikitableMovies` ≡ `getListOfMovie` (`zhwiki_leafs.py:1512-1529`,
  *   same shape at `zhwiki_all.py:38-55`): scan every `table.wikitable`
  *   row, read the SECOND raw child's first anchor, keep (href, title)
  *   pairs whose title attr is present and not a 页面不存在 redlink.
  * - `externalLinks` ≡ `getExtraLinks` (`zhwiki_leafs.py:1575-1602`):
  *   find the 外部連結 `span.mw-headline`, walk element siblings of its
  *   parent until a `ul`, collect (li text, href) for every
  *   `a.external`, and pull an IMDb id from the first `/ttNNN` href.
  */
object AuxExtractors {

  /** One movie row: the anchor's raw href and title attribute. */
  final case class MovieRow(href: String, title: String)

  /** `getListOfMovie`: `tr.children[1]` in the reference indexes RAW
    * children (text nodes included — real wiki HTML pretty-prints a
    * newline before the first cell). Rows whose second raw child is
    * not an element, has no anchor, or whose anchor lacks a title attr
    * are skipped; 页面不存在 titles (P9 redlinks) are dropped. Rows
    * with fewer than two children are skipped (the reference would
    * raise IndexError; a well-formed wikitable row always has ≥2). */
  def wikitableMovies(html: String): Vector[MovieRow] = {
    val doc = HtmlScanner.parse(html)
    val tables = doc.findAll(e => e.name == "table" && e.classes.contains("wikitable"))
    tables.flatMap(_.findByTag("tr")).flatMap { tr =>
      tr.children.lift(1) match {
        case Some(cell: HElem) =>
          cell.findFirst(_.name == "a").flatMap { a =>
            a.attr("title") match {
              case Some(t) if !t.contains("页面不存在") =>
                Some(MovieRow(a.attr("href").getOrElse(""), t))
              case _ => None
            }
          }
        case _ => None
      }
    }
  }

  /** One external link: the whole li's text and the anchor href. */
  final case class ExternalLink(text: String, url: String)

  private val ImdbRe = java.util.regex.Pattern.compile("/(tt\\d+)")

  /** `getExtraLinks`: returns (imdbId, links). The sibling walk uses
    * element siblings (the reference's `.next_sibling.next_sibling`
    * hops over the pretty-print newline between elements); a missing
    * ul or headline yields (None, empty). The LAST matching `/ttNNN`
    * href wins the imdbId, as in the reference's overwrite loop. */
  def externalLinks(html: String): (Option[String], Vector[ExternalLink]) = {
    val doc = HtmlScanner.parse(html)
    val headline = doc.findFirst(e =>
      e.name == "span" && e.classes.contains("mw-headline") && e.text.contains("外部連結"))
    headline match {
      case None => (None, Vector.empty)
      case Some(span) =>
        // parent of the headline span (the reference's .parent, usually
        // an <h2>), then element siblings within the parent's parent
        val parentOf = scala.collection.mutable.Map.empty[HElem, HElem]
        def index(e: HElem): Unit = e.childElems.foreach { c => parentOf(c) = e; index(c) }
        index(doc)
        val h = parentOf.get(span)
        val container = h.flatMap(parentOf.get)
        (h, container) match {
          case (Some(head), Some(cont)) =>
            val sibs = cont.childElems
            val start = sibs.indexWhere(_ eq head)
            val ul = if (start < 0) None
              else sibs.drop(start + 1).find(_.name == "ul")
            ul match {
              case None => (None, Vector.empty)
              case Some(u) =>
                var imdb: Option[String] = None
                val out = Vector.newBuilder[ExternalLink]
                u.findByTag("li").foreach { li =>
                  li.findAll(a => a.name == "a" && a.classes.contains("external")).foreach { a =>
                    val href = a.attr("href").getOrElse("")
                    out += ExternalLink(li.text.trim, href)
                    val m = ImdbRe.matcher(href)
                    if (m.find()) imdb = Some(m.group(1).trim)
                  }
                }
                (imdb, out.result())
            }
          case _ => (None, Vector.empty)
        }
    }
  }
}
