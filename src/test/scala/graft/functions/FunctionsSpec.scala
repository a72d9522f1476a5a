package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  import TextNorm._
  import UrlFunctions._

  test("strRe: '：' alone becomes empty, embedded stays") {
    assert(strRe("：") == "")
    assert(strRe("a：b") == "a：b")
    assert(strRe("  x  ") == "x")
    assert(strRe("a b c﻿") == "abc")
    assert(strRe("  x  ") == "x")
  }

  test("checkRepeatKey: empty → empty_key; duplicates suffixed from _2") {
    assert(checkRepeatKey("", Set()) == "empty_key")
    assert(checkRepeatKey("k", Set()) == "k")
    assert(checkRepeatKey("k", Set("k")) == "k_2")
    assert(checkRepeatKey("k", Set("k", "k_2")) == "k_3")
    assert(checkRepeatKey("", Set("empty_key")) == "empty_key_2")
  }

  test("zhHans maps only table chars") {
    assert(zhHans("中國歷史") == "中国历史")
    assert(zhHans("abc") == "abc")
    // r4-widened coverage: common chars outside the original 30
    assert(zhHans("這是一個關於臺灣經濟發展的條目") == "这是一个关于台湾经济发展的条目")
    assert(zhHans("圖書館讓學生閱讀報紙與雜誌") == "图书馆让学生阅读报纸与杂志")
    // many-to-one is legal: 發/髮 and 復/複 both simplify identically
    assert(zhHans("頭髮") == "头发" && zhHans("出發") == "出发")
    assert(zhHans("復興複雜") == "复兴复杂")
    // phrase-override layer (r4): reading-dependent 乾 and 著 —
    // qián/zhù readings keep their glyphs, gān/zhe readings simplify
    assert(zhHans("乾隆皇帝") == "乾隆皇帝")
    assert(zhHans("乾燥的乾坤") == "干燥的乾坤")
    assert(zhHans("著名的著作與穿著") == "著名的著作与穿着")
    assert(zhHans("顯著的土著編著") == "显著的土著编著")
    // r5 phrase widening: compounds previously left to the bare char map
    assert(zhHans("名著與原著的著者") == "名著与原著的著者")
    assert(zhHans("乾嘉學派") == "乾嘉学派")
    assert(zhHans("專著論著著錄") == "专著论著著录")
  }

  test("zhHans full-table properties: size, idempotence, round-trip safety") {
    // the full public one-char mapping (ICU CLDR via ZhTableGen)
    assert(zhHansTable.size >= 2500, s"table shrank: ${zhHansTable.size}")
    // idempotence by construction: every image is a fixpoint of the
    // char map, so converting twice changes nothing — over the WHOLE
    // domain, not a sample
    zhHansTable.foreach { case (t, s) =>
      assert(zhHansTable.getOrElse(s, s) == s,
        s"image '$s' of '$t' is not a fixpoint")
    }
    // round-trip safety: a fully simplified string survives zhHans
    val allSimplified = zhHansTable.values.mkString
    assert(zhHans(allSimplified) == allSimplified)
    // the supplementary-plane tail: keys convert, images are fixpoints
    assert(zhHansWideTable.nonEmpty)
    zhHansWideTable.foreach { case (t, w) =>
      assert(zhHans(t.toString) == w)
      assert(zhHans(w) == w, s"wide image '$w' of '$t' re-converts")
    }
    // idempotence through the PHRASE layer too (the layer can emit
    // preserved-glyph chars like 乾/著 — re-running must not simplify
    // them out of phrase context... unless the phrase survives, which
    // startsWith re-matching guarantees)
    val phraseText = "乾隆乾坤著名著作名著原著乾嘉著者著錄乾燥穿著"
    assert(zhHans(zhHans(phraseText)) == zhHans(phraseText))
  }

  test("zhHans idempotence over random strings from the table alphabet") {
    val alphabet: IndexedSeq[Char] =
      (zhHansTable.keys ++ zhHansTable.values ++ "乾著隆坤名作的與ab ".toSeq).toIndexedSeq
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val s = Array.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val once = zhHans(s)
      assert(zhHans(once) == once, s"not idempotent on '$s' -> '$once'")
      assert(once.length == s.length, s"length changed on '$s'")
    }
  }

  test("quote/unquote round-trip like Python") {
    assert(quote("中文 词条") == "%E4%B8%AD%E6%96%87%20%E8%AF%8D%E6%9D%A1")
    assert(unquote("%E4%B8%AD%E6%96%87") == "中文")
    assert(unquote("a+b") == "a+b") // Python unquote leaves '+'
    assert(buildWikiUrl("https://zh.wikipedia.org", "A/B") ==
      "https://zh.wikipedia.org/wiki/A/B")
  }

  test("hostOf / originOf") {
    assert(hostOf("https://zh.wikipedia.org/wiki/X") == "zh.wikipedia.org")
    assert(originOf("https://h1.x/wiki/Category:K1?page=2") == "https://h1.x")
  }

  test("canonicalizeLink branch coverage (zhwiki_leafs.py:238-271)") {
    val base = "https://zh.wikipedia.org"
    val page = "https://zh.wikipedia.org/wiki/P"
    // cite_note fragment → page url + href
    assert(canonicalizeLink(page, base, "#cite_note-1", "x", None, Set(), None).url
      == page + "#cite_note-1")
    // protocol-relative
    assert(canonicalizeLink(page, base, "//up.wiki/x.png", "t", None, Set(), None).url
      == "https://up.wiki/x.png")
    // absolute passthrough
    assert(canonicalizeLink(page, base, "http://en.wikipedia.org/wiki/X", "t", None, Set(), None).url
      == "http://en.wikipedia.org/wiki/X")
    // /wiki/ → base + href, oriTitle percent-decoded, File: stripped
    val l = canonicalizeLink(page, base, "/wiki/File%3A圖.jpg", "", None, Set(), None)
    assert(l.url == base + "/wiki/File%3A圖.jpg")
    assert(l.oriTitle == "圖.jpg")
    // title fallback chain: empty text → title attr unquoted
    val l2 = canonicalizeLink(page, base, "/wiki/X", "", Some("%E4%B8%AD"), Set(), None)
    assert(l2.title == "中")
    // image-class fallback
    val l3 = canonicalizeLink(page, base, "/wiki/F", "", None, Set("image"), Some("alt文"))
    assert(l3.title == "alt文")
    // kartographer fallback
    val l4 = canonicalizeLink(page, base, "/wiki/M", "", None, Set("mw-kartographer-map"), None)
    assert(l4.title == "mw-kartographer-map")
    // last-path-segment fallback
    val l5 = canonicalizeLink(page, base, "/wiki/Seg", "", None, Set(), None)
    assert(l5.title == "Seg")
  }

  test("sanitize filename: narrow vs wide variants differ (fidelity quirk)") {
    assert(sanitizeFilenameNarrow("a:b/c.d") == "a-b--c.d")
    assert(sanitizeFilenameWide("a:b/c.d") == "a-b--c-d")
    assert(sanitizeFilenameWide(""" x?*"<>|y\ """) == "x------y--")
  }

  test("mergeDict suffixes repeated keys in insertion order") {
    val m = collection.mutable.LinkedHashMap[String, Any]("a" -> 1)
    val r = mergeDict(m, collection.mutable.LinkedHashMap[String, Any]("a" -> 2, "b" -> 3))
    assert(r.keys.toSeq == Seq("a", "a_2", "b"))
  }
}
