package graft.html

import HtmlScanner._
import graft.functions.TextNorm.{strRe, zhHans}

/** X2–X8: article-page extraction into the interleaved span schema,
  * faithful to `spider` (`zhwiki_leafs.py:109-216`).
  *
  * Span encoding (SURVEY.md §1.3, BASELINE.json input_hint): one span
  * per extracted unit in document order, `offset` = 0-based span index:
  *   text → toc* → image* → thumb* → info → link
  */
object PageParser {

  /** One interleaved span (the `docs.spans` element struct). */
  final case class Span(kind: String, text: String, media_ref: String, offset: Int)

  /** Full parse result (wide companion columns of FIXTURES.md §2). */
  final case class ParsedPage(
      firstPar: String,
      catalog: Vector[(String, String)],
      imgs: Vector[(String, String, String)],     // (wiki_url, small_url, alt)
      enwikiUrl: String,
      infoJson: Option[String],
      thumbs: Vector[(String, String, String)],   // (head, '||'-joined urls, caption)
      pageHtml: String
  ) {
    def spans: Vector[Span] = {
      val b = Vector.newBuilder[Span]
      var i = 0
      def add(kind: String, text: String, ref: String): Unit = {
        b += Span(kind, text, ref, i); i += 1
      }
      add("text", firstPar, "")
      catalog.foreach { case (num, txt) => add("toc", s"$num $txt", "") }
      imgs.foreach { case (wikiUrl, _, alt) => add("image", alt, wikiUrl) }
      thumbs.foreach { case (head, urls, cap) => add("thumb", s"$head\n$cap", urls) }
      infoJson.foreach(j => add("info", j, ""))
      if (enwikiUrl.nonEmpty) add("link", "interwiki-en", enwikiUrl)
      b.result()
    }
  }

  /** `get_par_text` (`zhwiki_leafs.py:90-107`): concatenate paragraph
    * contents, skipping cite-note anchors, sup, and noteTag spans. */
  def parText(p: HElem): String = {
    val sb = new StringBuilder
    p.children.foreach {
      case HText(t) => sb.append(strRe(t))
      case e: HElem =>
        e.name match {
          case "a" if e.attr("href").exists(_.contains("#cite_note")) => ()
          case "a"   => sb.append(strRe(e.text))
          case "sup" => ()
          case "span" if e.id.exists(_.contains("noteTag-cite_ref-sup")) => ()
          case _ => sb.append(strRe(e.text))
        }
    }
    sb.toString
  }

  /** Serialize an element back to HTML (reference stores
    * `str(div.mw-parser-output)`, `zhwiki_leafs.py:133-136`). Attribute
    * order = insertion order of the restricted scanner. */
  private val selfRendered = Set("img", "br", "hr")

  def render(e: HElem): String = {
    // iterative (explicit stack, close tags as string markers): render
    // depth must not be bounded by the JVM call stack — see
    // HtmlScanner.parse for why (pathologically nested real pages)
    val sb = new StringBuilder
    val stack = new java.util.ArrayDeque[AnyRef]
    stack.push(e)
    while (!stack.isEmpty) {
      stack.pop() match {
        case HText(t) => sb.append(escape(t))
        case el: HElem =>
          sb.append('<').append(el.name)
          el.attrs.foreach { case (k, v) =>
            sb.append(' ').append(k).append("=\"").append(escape(v)).append('"')
          }
          if (el.children.isEmpty && selfRendered(el.name)) sb.append("/>")
          else {
            sb.append('>')
            stack.push("</" + el.name + ">")
            var j = el.children.length - 1
            while (j >= 0) { stack.push(el.children(j)); j -= 1 }
          }
        case s: String => sb.append(s)
      }
    }
    sb.toString
  }

  /** X9: resolve an image FILE PAGE to its real media URL + title —
    * `soup.find('div', class='fullMedia').find('p').find('a')`, href
    * prefixed with 'https:' (the anchor is protocol-relative), title =
    * the anchor's title attr (`zhwiki_leafs.py:1465-1474`). None when
    * the page has no fullMedia div (malformed file page). */
  def resolveFullMedia(html: String): Option[(String, String)] = {
    val doc = HtmlScanner.parse(html)
    for {
      fm <- doc.findFirst(e => e.name == "div" && e.classes.contains("fullMedia"))
      p <- fm.findFirst(_.name == "p")
      a <- p.findFirst(_.name == "a")
    } yield ("https:" + a.attr("href").getOrElse(""), a.attr("title").getOrElse(""))
  }

  /** Parse one article page. Returns None when the page has no
    * mw-parser-output div (reference returns early, `:134-135`). */
  def parse(pageUrl: String, base: String, html: String): Option[ParsedPage] = {
    val doc = HtmlScanner.parse(html)
    val pageTxt = doc.findFirst(e => e.name == "div" && e.classes.contains("mw-parser-output"))
      .getOrElse(return None)

    // first paragraph (`:138-148`): first non-empty DIRECT child <p>
    var firstPar = ""
    pageTxt.childElems.filter(_.name == "p").iterator
      .map(parText)
      .find(_.nonEmpty)
      .foreach(t => firstPar = zhHans(t))

    // TOC (`:150-157`)
    val catalog = doc
      .findFirst(e =>
        e.name == "div" && e.id.contains("toc") && e.classes.contains("toc") &&
          e.attr("aria-labelledby").contains("mw-toc-heading"))
      .map { toc =>
        toc.findByTag("a").flatMap { a =>
          for {
            num <- a.findFirst(x => x.name == "span" && x.classes.contains("tocnumber"))
            txt <- a.findFirst(x => x.name == "span" && x.classes.contains("toctext"))
          } yield (num.text.trim, txt.text.trim)
        }
      }
      .getOrElse(Vector.empty)

    // images (`:159-171`): a.image under mw-parser-output, first-wins dedup on wiki_url
    val allImgs = pageTxt
      .findAll(e => e.name == "a" && e.classes.contains("image"))
      .flatMap { aimg =>
        aimg.findFirst(_.name == "img").map { img =>
          (base + aimg.attr("href").getOrElse(""),
           "https:" + img.attr("src").getOrElse(""),
           img.attr("alt").getOrElse(""))
        }
      }
    val seen = collection.mutable.Set.empty[String]
    val imgs = allImgs.filter(t => seen.add(t._1))

    // interlanguage link (`:173-179`)
    var enwiki = ""
    doc.findFirst(e => e.name == "h3" && e.id.contains("p-lang-label")).foreach { h3 =>
      // BS4 next_sibling.next_sibling: the next element sibling (text
      // node in between). Our scanner: next element sibling in parent.
      val parent = doc.findFirst(_.childElems.exists(_ eq h3))
      parent.flatMap(p => h3.nextElemSibling(p)).foreach { sib =>
        sib.findFirst(e => e.name == "li" && e.classes.contains("interwiki-en"))
          .flatMap(_.findFirst(_.name == "a"))
          .flatMap(_.attr("href"))
          .foreach(enwiki = _)
      }
    }

    // infobox (`:182-188`)
    val infoJson = doc
      .findFirst(e => e.name == "table" && e.classes.contains("infobox"))
      .filter(t => !t.classes.contains("mbox-small") && !t.classes.contains("sisterproject"))
      .map(t => InfoboxParser.toJson(InfoboxParser.parse(pageUrl, base, t)))

    // thumbs (`:190-214`)
    val thumbs = pageTxt
      .findAll(e => e.name == "div" && e.classes.contains("thumbinner"))
      .map { th =>
        val head = th.findFirst(e => e.name == "div" && e.classes.contains("theader"))
          .map(_.text.trim).getOrElse("")
        val urls = th.findAll(e => e.name == "a" && e.classes.contains("image"))
          .map(a => base + a.attr("href").getOrElse(""))
        val cap = th.findFirst(e => e.name == "div" && e.classes.contains("thumbcaption"))
          .map(_.text.trim).getOrElse("")
        (head, if (urls.nonEmpty) urls.mkString("||") else "", cap)
      }

    Some(ParsedPage(firstPar, catalog, imgs, enwiki, infoJson, thumbs, render(pageTxt)))
  }
}
