package graft.html

import org.scalatest.funsuite.AnyFunSuite
import HtmlScanner._

/** Stack-safety + malformed-input semantics of the scanner layer.
  *
  * A 10^10-page crawl WILL fetch pathologically nested and malformed
  * documents; a StackOverflowError inside a task kills the stage after
  * its retries, so parse/text/find/render must be iterative, and
  * malformed input must have pinned, total semantics (not "generator
  * never emits it").
  */
class ScannerRobustnessSpec extends AnyFunSuite {

  private val Depth = 200000

  private def deepHtml(depth: Int): String = {
    val sb = new StringBuilder
    (0 until depth).foreach(_ => sb.append("<div>"))
    sb.append("core")
    (0 until depth).foreach(_ => sb.append("</div>"))
    sb.toString
  }

  test("parse survives 200k-deep nesting (no call-stack recursion)") {
    val root = HtmlScanner.parse(deepHtml(Depth))
    // verify shape without recursing: walk down iteratively
    var e = root
    var d = 0
    while (e.childElems.nonEmpty) { e = e.childElems.head; d += 1 }
    assert(d == Depth)
    assert(e.children == Vector(HText("core")))
  }

  test("text / strippedStrings / findAll / findFirst are stack-safe at depth") {
    val root = HtmlScanner.parse(deepHtml(Depth))
    assert(root.text == "core")
    assert(root.strippedStrings == Vector("core"))
    assert(root.findAll(_.name == "div").length == Depth)
    assert(root.findFirst(e => e.name == "div" && e.childElems.isEmpty).isDefined)
  }

  test("render is stack-safe at depth and round-trips") {
    val html = deepHtml(Depth)
    val root = HtmlScanner.parse(html)
    val out = PageParser.render(root.childElems.head)
    assert(out == html)
  }

  test("render round-trips attrs, void tags and entities") {
    val html = """<div class="a b" id="x">t&amp;u<img src="u.png" alt="i"/><p>q</p></div>"""
    val out = PageParser.render(HtmlScanner.parse(html).childElems.head)
    assert(out == html)
  }

  test("malformed: mismatched close tag closes exactly one open level") {
    // <p> is closed by </b>; "y" lands back in <div>
    val root = HtmlScanner.parse("<div><p>x</b>y</div>z")
    assert(root.children == Vector(
      HElem("div", Map.empty, Vector(
        HElem("p", Map.empty, Vector(HText("x"))),
        HText("y"))),
      HText("z")))
  }

  test("malformed: stray close tag at root truncates the rest") {
    val root = HtmlScanner.parse("a<p>x</p></b>tail<p>y</p>")
    assert(root.children == Vector(
      HText("a"),
      HElem("p", Map.empty, Vector(HText("x")))))
  }

  test("malformed: unterminated open tag truncates") {
    val root = HtmlScanner.parse("<div>a<sp")
    assert(root.children == Vector(
      HElem("div", Map.empty, Vector(HText("a")))))
  }

  test("malformed: EOF auto-closes every open element") {
    val root = HtmlScanner.parse("<div><ul><li>x")
    assert(root.children == Vector(
      HElem("div", Map.empty, Vector(
        HElem("ul", Map.empty, Vector(
          HElem("li", Map.empty, Vector(HText("x")))))))))
  }

  test("malformed: attribute garbage degrades to empty attrs, parse total") {
    val root = HtmlScanner.parse("""<div foo=bar baz><p a="unterminated>x</p></div>""")
    // foo=bar (no quote) → attrs dropped from that point; document still parses
    assert(root.findAll(_ => true).nonEmpty)
  }
}
