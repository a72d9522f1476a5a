package graft.html

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property coverage for the infobox parser over RANDOM compositions of
  * the restricted grammar — the hand fixtures in HtmlSpec pin each
  * branch's exact output; these pin the parser's global contracts on
  * arbitrary branch interleavings (the shapes a real template soup
  * produces that no enumerated fixture list anticipates):
  *   1. total: never throws on any generated table;
  *   2. deterministic: byte-identical JSON across repeated parses;
  *   3. cleanBlank idempotent: cleaning a cleaned tree is the identity;
  *   4. no structural leaks: JSON never contains nulls or unrendered
  *      scanner artifacts ("<", "null").
  */
class InfoboxPropertySpec extends AnyFunSuite {

  /** Deterministic sampler (no scalatest-scalacheck bridge in the
    * offline cache): fixed seed chain, n samples, every failure
    * reports the offending HTML. */
  private def forAllSamples(gen: Gen[String], n: Int)(body: String => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 3) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(v) => produced += 1; body(v)
        case None    =>
      }
      seed = seed.next
      attempts += 1
    }
    assert(produced >= n, s"generator too sparse: $produced/$n samples")
  }

  private val Base = "https://zh.wikipedia.org"

  private val words = Gen.oneOf(
    "名稱", "值甲", "分區", "歷史", "地理", "人口", "面積", "網站", "官方网站",
    "格言", "支流", "起點", "市花", "梅花", "東區", "概況", "沿革", "路線", "主線")

  private def anchor(i: Int): Gen[String] =
    words.map(w => s"""<a href="/wiki/P$i" title="$w">$w</a>""")

  private val inline: Gen[String] = Gen.frequency(
    4 -> words,
    2 -> Gen.choose(0, 99).flatMap(anchor),
    1 -> Gen.const("<br/>"),
    1 -> words.map(w => s"<b>$w</b>"),
    1 -> Gen.const("""<img src="//u.x/i.png" alt="圖"/>"""))

  private val ulGen: Gen[String] =
    Gen.listOfN(2, words).map(_.map(w => s"<li>$w</li>").mkString("<ul>", "", "</ul>"))

  private val navFrameGen: Gen[String] =
    for {
      head <- words
      lis <- Gen.listOfN(2, words)
    } yield s"""<div class="NavFrame"><div class="NavHead">$head</div>""" +
      lis.map(w => s"<li>$w<br/>尾</li>").mkString("""<ul class="NavContent">""", "", "</ul>") +
      "</div>"

  private val streetGen: Gen[String] =
    for { b <- words; t <- words } yield
      s"""<span class="street-address">前<b>$b</b>$t</span>"""

  private def innerTable(depth: Int): Gen[String] =
    if (depth <= 0) words
    else for {
      k <- words
      v <- words
    } yield s"""<table><tbody><tr><th>$k</th><td>$v</td></tr></tbody></table>"""

  private def tdContent(depth: Int): Gen[String] = Gen.frequency(
    6 -> Gen.listOfN(3, inline).map(_.mkString),
    2 -> ulGen,
    1 -> navFrameGen,
    1 -> streetGen,
    1 -> innerTable(depth),
    1 -> words.map(w => s"""<div class="w"><b>$w</b>內文</div>"""),
    1 -> words.map(w => s"""<span class="h"><b>$w</b></span>後綴"""))

  private val thStyle: Gen[String] = Gen.oneOf(
    "", """ style="background:#ccf"""", """ style="background:#dde; text-align:center"""",
    """ style="text-align: center"""")

  private val trGen: Gen[String] = Gen.frequency(
    3 -> (for { w <- words; s <- thStyle } yield s"<tr><th$s>$w</th></tr>"),
    4 -> (for { w <- words; c <- tdContent(1) } yield s"<tr><th>$w</th><td>$c</td></tr>"),
    1 -> (for { a <- words; b <- words } yield s"<tr><th>$a</th><th>$b</th></tr>"),
    1 -> (for { a <- words; b <- words } yield
      s"""<tr class="mergedrow"><td>$a</td><td>$b</td></tr>"""),
    1 -> words.map(w => s"""<tr class="mergedrow"><td><b>$w</b></td></tr>"""),
    1 -> tdContent(1).map(c => s"<tr><td>$c</td></tr>"))

  private val tableGen: Gen[String] =
    for {
      cap <- Gen.option(words)
      trs <- Gen.nonEmptyListOf(trGen)
    } yield """<table class="infobox">""" +
      cap.map(c => s"<caption>$c</caption>").getOrElse("") +
      trs.mkString("<tbody>", "", "</tbody>") + "</table>"

  private def parseJson(html: String): String = {
    val t = HtmlScanner.parse(html).findFirst(_.name == "table").get
    InfoboxParser.toJson(InfoboxParser.parse(s"$Base/wiki/X", Base, t))
  }

  test("parser is total and deterministic over random restricted-grammar tables") {
    forAllSamples(tableGen, 200) { html =>
      val j1 = parseJson(html)
      val j2 = parseJson(html)
      assert(j1 == j2, s"non-deterministic parse for: $html")
      assert(!j1.contains("null"), s"null leaked into JSON for: $html")
      assert(!j1.contains("<"), s"unrendered markup leaked for: $html")
    }
  }

  test("cleanBlank is idempotent on parse output") {
    forAllSamples(tableGen, 100) { html =>
      val t = HtmlScanner.parse(html).findFirst(_.name == "table").get
      val d = InfoboxParser.parse(s"$Base/wiki/X", Base, t)
      val once = InfoboxParser.cleanBlank(d)
      val twice = InfoboxParser.cleanBlank(once.asInstanceOf[InfoboxParser.IDict])
      assert(InfoboxParser.toJson(once) == InfoboxParser.toJson(twice),
        s"cleanBlank not idempotent for: $html")
    }
  }

  test("page parser is total over random article-like pages carrying generated infoboxes") {
    forAllSamples(tableGen, 60) { box =>
      val html = s"""<html><body><div class="mw-parser-output"><p>首段文字</p>$box</div></body></html>"""
      val parsed = PageParser.parse(s"$Base/wiki/X", Base, html)
      assert(parsed.isDefined)
      val spans = parsed.get.spans
      assert(spans.map(_.offset) == spans.indices.toVector)
    }
  }
}
