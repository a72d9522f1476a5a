package graft.html

import org.scalatest.funsuite.AnyFunSuite

class AuxExtractorsSpec extends AnyFunSuite {

  test("X10 wikitable movies: second-raw-child anchor, redlink drop, multi-table (zhwiki_leafs.py:1512-1529)") {
    val html =
      """<html><body>
        |<table class="wikitable"><tbody>
        |<tr>
        |<td><a href="/wiki/M1" title="電影一">電影一</a></td><td>2013</td></tr>
        |<tr>
        |<td><a href="/w/index.php?title=M2&redlink=1" title="M2（页面不存在）">M2</a></td><td>2013</td></tr>
        |<tr>
        |<td>純文字格</td><td>2014</td></tr>
        |<tr>
        |<td><a href="/wiki/M3">無標題</a></td><td>2014</td></tr>
        |</tbody></table>
        |<table class="wikitable"><tbody>
        |<tr>
        |<td><a href="/wiki/M4" title="電影四">電影四</a></td><td>2015</td></tr>
        |</tbody></table>
        |<table class="other"><tbody>
        |<tr>
        |<td><a href="/wiki/M5" title="非wikitable">x</a></td></tr>
        |</tbody></table>
        |</body></html>""".stripMargin
    val rows = AuxExtractors.wikitableMovies(html)
    assert(rows == Vector(
      AuxExtractors.MovieRow("/wiki/M1", "電影一"),
      AuxExtractors.MovieRow("/wiki/M4", "電影四")))
  }

  test("X10 wikitable movies: first-cell-without-anchor rows are skipped, not shifted") {
    // chs[1] is the FIRST cell when a newline precedes it — a row whose
    // link sits in the second cell is NOT found (reference indexing)
    val html =
      """<table class="wikitable"><tbody>
        |<tr>
        |<td>1</td><td><a href="/wiki/M9" title="第二格">x</a></td></tr>
        |</tbody></table>""".stripMargin
    assert(AuxExtractors.wikitableMovies(html).isEmpty)
  }

  test("X11 external links: li text + external hrefs, last IMDb id wins (zhwiki_leafs.py:1575-1602)") {
    val html =
      """<html><body>
        |<h2><span class="mw-headline" id="xl">外部連結</span></h2>
        |<p>介紹段落</p>
        |<ul>
        |<li>官方站 <a class="external" href="https://example.org/f1">連結一</a></li>
        |<li>在<a class="external" href="https://www.imdb.com/title/tt0111161/">IMDb</a>上的頁面
        |<a href="/wiki/Internal" title="內部">內部鏈</a></li>
        |<li><a class="external" href="https://www.imdb.com/title/tt0068646/">第二部</a></li>
        |</ul>
        |</body></html>""".stripMargin
    val (imdb, links) = AuxExtractors.externalLinks(html)
    assert(imdb.contains("tt0068646")) // overwrite loop: last match wins
    assert(links.map(_.url) == Vector(
      "https://example.org/f1",
      "https://www.imdb.com/title/tt0111161/",
      "https://www.imdb.com/title/tt0068646/"))
    // internal (non-external-class) anchors contribute no rows
    assert(links.forall(l => !l.url.contains("/wiki/Internal")))
    assert(links.head.text == "官方站 連結一")
  }

  test("X11 external links: missing headline or trailing ul yields empty") {
    assert(AuxExtractors.externalLinks("<html><body><p>x</p></body></html>") ==
      ((None, Vector.empty)))
    val noUl =
      """<h2><span class="mw-headline">外部連結</span></h2><p>尾段</p>"""
    assert(AuxExtractors.externalLinks(noUl) == ((None, Vector.empty)))
  }
}
