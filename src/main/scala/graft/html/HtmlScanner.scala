package graft.html

import scala.collection.mutable.ArrayBuffer

/** Minimal HTML DOM for the restricted, well-formed grammar emitted by
  * the synthetic page generator (SURVEY.md §7.1: no jsoup offline, so
  * scanner and generator are co-designed; the oracle SimCrawler uses
  * this same scanner, making span-equality a test of the PIPELINE, not
  * of a third-party parser).
  *
  * Supported: nested elements, double-quoted attributes, self-closing
  * tags, void elements (img/br/hr), text nodes, the five basic
  * entities. Not supported (generator never emits them): comments,
  * CDATA, unquoted attrs, implicit tag closing.
  */
object HtmlScanner {

  sealed trait HNode
  final case class HText(text: String) extends HNode
  final case class HElem(
      name: String,
      attrs: Map[String, String],
      children: Vector[HNode]
  ) extends HNode {

    def attr(k: String): Option[String] = attrs.get(k)
    def classes: Set[String] =
      attrs.get("class").map(_.split("\\s+").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    def id: Option[String] = attrs.get("id")

    def childElems: Vector[HElem] = children.collect { case e: HElem => e }

    /** All text of the subtree, document order (BeautifulSoup get_text). */
    def text: String = {
      val sb = new StringBuilder
      def rec(n: HNode): Unit = n match {
        case HText(t)         => sb.append(t)
        case HElem(_, _, cs)  => cs.foreach(rec)
      }
      rec(this)
      sb.toString
    }

    /** Non-empty stripped text fragments in document order
      * (BeautifulSoup stripped_strings). */
    def strippedStrings: Vector[String] = {
      val out = ArrayBuffer.empty[String]
      def rec(n: HNode): Unit = n match {
        case HText(t) => val s = t.trim; if (s.nonEmpty) out += s
        case HElem(_, _, cs) => cs.foreach(rec)
      }
      rec(this)
      out.toVector
    }

    /** First descendant element matching, depth-first document order
      * (BeautifulSoup find). */
    def findFirst(p: HElem => Boolean): Option[HElem] = {
      def rec(e: HElem): Option[HElem] = {
        if (p(e)) Some(e)
        else e.childElems.iterator.map(rec).collectFirst { case Some(x) => x }
      }
      childElems.iterator.map(rec).collectFirst { case Some(x) => x }
    }

    /** All descendant elements matching, depth-first document order
      * (BeautifulSoup find_all). */
    def findAll(p: HElem => Boolean): Vector[HElem] = {
      val out = ArrayBuffer.empty[HElem]
      def rec(e: HElem): Unit = {
        if (p(e)) out += e
        e.childElems.foreach(rec)
      }
      childElems.foreach(rec)
      out.toVector
    }

    def findByTag(tag: String): Vector[HElem] = findAll(_.name == tag)
    def findById(tag: String, idv: String): Option[HElem] =
      findFirst(e => e.name == tag && e.id.contains(idv))
    def findByClass(tag: String, cls: String): Vector[HElem] =
      findAll(e => e.name == tag && e.classes.contains(cls))

    /** Next element sibling within `parent` (BS4 next_sibling.next_sibling
      * over whitespace-separated siblings). */
    def nextElemSibling(parent: HElem): Option[HElem] = {
      val sibs = parent.childElems
      val i = sibs.indexWhere(_ eq this)
      if (i >= 0 && i + 1 < sibs.length) Some(sibs(i + 1)) else None
    }
  }

  private val voidTags = Set("img", "br", "hr", "meta", "link", "input")

  def unescape(s: String): String =
    if (!s.contains('&')) s
    else
      s.replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", "\"")
        .replace("&#39;", "'")
        .replace("&amp;", "&")

  def escape(s: String): String = {
    // fast path: generator/page text is overwhelmingly clean; the
    // four-replace chain would allocate up to 4 copies per call
    var i = 0
    var dirty = false
    while (i < s.length && !dirty) {
      val c = s.charAt(i)
      dirty = c == '&' || c == '<' || c == '>' || c == '"'
      i += 1
    }
    if (!dirty) s
    else
      s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace("\"", "&quot;")
  }

  /** Parse a document; returns a synthetic root element wrapping all
    * top-level nodes. */
  def parse(html: String): HElem = {
    var i = 0
    val n = html.length

    def parseAttrs(endIdx: Int, from: Int): Map[String, String] = {
      var j = from
      val m = Map.newBuilder[String, String]
      while (j < endIdx) {
        while (j < endIdx && (html(j).isWhitespace || html(j) == '/')) j += 1
        if (j < endIdx) {
          val eq = html.indexOf('=', j)
          if (eq == -1 || eq >= endIdx) return m.result()
          val key = html.substring(j, eq).trim
          val q1 = html.indexOf('"', eq)
          if (q1 == -1 || q1 >= endIdx) return m.result()
          val q2 = html.indexOf('"', q1 + 1)
          if (q2 == -1) return m.result()
          m += key -> unescape(html.substring(q1 + 1, q2))
          j = q2 + 1
        }
      }
      m.result()
    }

    def parseNodes(closeTag: Option[String]): Vector[HNode] = {
      val out = ArrayBuffer.empty[HNode]
      while (i < n) {
        val lt = html.indexOf('<', i)
        if (lt == -1) {
          if (i < n) out += HText(unescape(html.substring(i)))
          i = n
          return out.toVector
        }
        if (lt > i) out += HText(unescape(html.substring(i, lt)))
        val gt = html.indexOf('>', lt)
        if (gt == -1) { i = n; return out.toVector }
        val inner = html.substring(lt + 1, gt)
        if (inner.startsWith("/")) {
          i = gt + 1
          val name = inner.substring(1).trim
          if (closeTag.contains(name)) return out.toVector
          // stray close tag for another level: treat as closing here too
          // (generator never emits mismatched tags)
          return out.toVector
        } else {
          val selfClosing = inner.endsWith("/")
          val body = if (selfClosing) inner.dropRight(1) else inner
          val sp = body.indexWhere(_.isWhitespace)
          val name = (if (sp == -1) body else body.substring(0, sp)).toLowerCase
          val attrEnd = if (selfClosing) gt - 1 else gt
          val attrs =
            if (sp == -1) Map.empty[String, String]
            else parseAttrs(attrEnd, lt + 1 + sp)
          i = gt + 1
          if (selfClosing || voidTags(name)) {
            out += HElem(name, attrs, Vector.empty)
          } else {
            val kids = parseNodes(Some(name))
            out += HElem(name, attrs, kids)
          }
        }
      }
      out.toVector
    }

    HElem("#root", Map.empty, parseNodes(None))
  }
}
