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
  *
  * Robustness (a real crawl fetches pages OUTSIDE the grammar): parse
  * and every traversal are iterative — depth is never bounded by the
  * JVM call stack — and malformed input has pinned total semantics
  * (ScannerRobustnessSpec): any close tag closes exactly one open
  * level, a close tag with nothing open truncates the rest, an
  * unterminated `<tag` truncates, EOF closes every open element.
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

    /** All text of the subtree, document order (BeautifulSoup get_text).
      * Iterative (explicit stack): traversal depth must not be bounded
      * by the JVM call stack — a real crawl sees pathologically nested
      * pages, and a StackOverflowError in a task kills the stage. */
    def text: String = {
      val sb = new StringBuilder
      val stack = new java.util.ArrayDeque[HNode]
      stack.push(this)
      while (!stack.isEmpty) {
        stack.pop() match {
          case HText(t) => sb.append(t)
          case HElem(_, _, cs) =>
            var j = cs.length - 1
            while (j >= 0) { stack.push(cs(j)); j -= 1 }
        }
      }
      sb.toString
    }

    /** Non-empty stripped text fragments in document order
      * (BeautifulSoup stripped_strings). Iterative — see [[text]]. */
    def strippedStrings: Vector[String] = {
      val out = ArrayBuffer.empty[String]
      val stack = new java.util.ArrayDeque[HNode]
      stack.push(this)
      while (!stack.isEmpty) {
        stack.pop() match {
          case HText(t) => val s = t.trim; if (s.nonEmpty) out += s
          case HElem(_, _, cs) =>
            var j = cs.length - 1
            while (j >= 0) { stack.push(cs(j)); j -= 1 }
        }
      }
      out.toVector
    }

    /** First descendant element matching, depth-first document order
      * (BeautifulSoup find). Iterative — see [[text]]. */
    def findFirst(p: HElem => Boolean): Option[HElem] = {
      val stack = new java.util.ArrayDeque[HElem]
      val cs = childElems
      var j = cs.length - 1
      while (j >= 0) { stack.push(cs(j)); j -= 1 }
      while (!stack.isEmpty) {
        val e = stack.pop()
        if (p(e)) return Some(e)
        val ks = e.childElems
        var i = ks.length - 1
        while (i >= 0) { stack.push(ks(i)); i -= 1 }
      }
      None
    }

    /** All descendant elements matching, depth-first document order
      * (BeautifulSoup find_all). Iterative — see [[text]]. */
    def findAll(p: HElem => Boolean): Vector[HElem] = {
      val out = ArrayBuffer.empty[HElem]
      val stack = new java.util.ArrayDeque[HElem]
      val cs = childElems
      var j = cs.length - 1
      while (j >= 0) { stack.push(cs(j)); j -= 1 }
      while (!stack.isEmpty) {
        val e = stack.pop()
        if (p(e)) out += e
        val ks = e.childElems
        var i = ks.length - 1
        while (i >= 0) { stack.push(ks(i)); i -= 1 }
      }
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

    // Iterative tree build (explicit open-element stack): parse depth
    // must not be bounded by the JVM call stack — a 10^10-page crawl
    // WILL see pathologically nested documents, and a StackOverflowError
    // in a task kills the stage after its retries. Semantics are
    // byte-identical to the recursive original, including its quirks on
    // malformed input: ANY close tag closes exactly one open level
    // (mismatched names included); a close tag with nothing open
    // truncates the rest of the document (the recursive root-level
    // `return`); an unterminated `<tag` truncates; EOF closes every
    // still-open element with its accumulated children.
    val names = ArrayBuffer[String]("#root")
    val attrsStack = ArrayBuffer[Map[String, String]](Map.empty)
    val bufs = ArrayBuffer[ArrayBuffer[HNode]](ArrayBuffer.empty[HNode])

    def closeTop(): Unit = {
      val kids = bufs.remove(bufs.length - 1).toVector
      val nm = names.remove(names.length - 1)
      val at = attrsStack.remove(attrsStack.length - 1)
      bufs(bufs.length - 1) += HElem(nm, at, kids)
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt == -1) {
        bufs(bufs.length - 1) += HText(unescape(html.substring(i)))
        i = n
      } else {
        if (lt > i) bufs(bufs.length - 1) += HText(unescape(html.substring(i, lt)))
        val gt = html.indexOf('>', lt)
        if (gt == -1) { i = n }
        else {
          val inner = html.substring(lt + 1, gt)
          i = gt + 1
          if (inner.startsWith("/")) {
            if (names.length > 1) closeTop()
            else i = n // stray close at root: truncate, like the recursive return
          } else {
            val selfClosing = inner.endsWith("/")
            val body = if (selfClosing) inner.dropRight(1) else inner
            val sp = body.indexWhere(_.isWhitespace)
            val name = (if (sp == -1) body else body.substring(0, sp)).toLowerCase
            val attrEnd = if (selfClosing) gt - 1 else gt
            val attrs =
              if (sp == -1) Map.empty[String, String]
              else parseAttrs(attrEnd, lt + 1 + sp)
            if (selfClosing || voidTags(name)) {
              bufs(bufs.length - 1) += HElem(name, attrs, Vector.empty)
            } else {
              names += name
              attrsStack += attrs
              bufs += ArrayBuffer.empty[HNode]
            }
          }
        }
      }
    }
    while (names.length > 1) closeTop()
    HElem("#root", Map.empty, bufs(0).toVector)
  }
}
