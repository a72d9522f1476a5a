package graft.html

import scala.collection.mutable
import graft.functions.TextNorm.{checkRepeatKey, strRe}
import graft.functions.UrlFunctions.{canonicalizeLink, ResolvedLink}
import HtmlScanner._

/** Infobox extractor — a faithful RESTRICTED subset of the reference's
  * `get_table_info_3` (`zhwiki_leafs.py:930-1370`) + `get_td_contents`
  * (`:316-918`) + `get_one_tag_content_br` (`:282-314`), covering the
  * branches the synthetic page generator emits (SURVEY.md §7.6: full
  * Wikipedia-template coverage is unreachable offline; grammar and
  * parser are co-designed, the oracle SimCrawler uses this same code,
  * so span equality tests the pipeline).
  *
  * Supported branches: caption key (`:943-953`), multi-th row
  * (`:961-980`), th-only row with background/navbox-title/text-align
  * styles (`:982-1059`), th+td rows incl. '•'-prefixed third/fourth
  * keys (`:1061-1129`), first-tr background-td first key
  * (`:1134-1147`), the td-as-key special cases (`:1160-1327`):
  * single centered bold-background td, direct-child <b> /
  * span.nowrap 2-td rows, #f0f0f0-background tables, centered bold
  * #cddeff tds, and tr.mergedrow 1-/2-td rows — each opening a
  * second/third key level from a TD; td content: inline text/links
  * with <br> splits, <b> sub-keys, ul/plainlist/hlist li lists, img
  * entries, the navbar-mini skip (`:368-372`), direct NavFrame
  * (`:373-473`: NavHead keys, ul/div NavContent, per-li plainlist
  * walk, nested get_table_info_3, the links_title-as-ori quirk),
  * width-50% <p> middle keys (`:475-479`), span.street-address
  * b-keyed sub-dicts (`:504-547`), first-content span-with-<b> head
  * (`:548-549`), descendant NavFrames with display:none skip
  * (`:561-610`), the full nested-table branch (`:611-783`:
  * single-tr/no-th `table_td_N` walk with toccolours flags and
  * div>p/ul content, else get_table_info_3 keys via check_repeat_key
  * plus the th-background is_table_th_background flag),
  * single-div-with-direct-<b> heads incl. the 网站 under-first rule
  * and the NavFrame '\n' prefix quirk (`:841-884`), the
  * e6e9ff/right/xx-small template filter (`:331-335`),
  * 封面图片 / td_content default heads (all four shapes,
  * `:337-345`), border-top / two-div-img should_under_first_key
  * (`:347-352`), the 若非注明 data-source first-level override
  * (`:1339`), is_table_th_background threading into the attach
  * conditions (`:1340,1360`), and `clean_blank_table_info`
  * (`:218-231`).
  */
object InfoboxParser {

  /** Infobox value tree: insertion-ordered dict or string list. */
  sealed trait IV
  final case class IDict(m: mutable.LinkedHashMap[String, IV] = mutable.LinkedHashMap.empty)
      extends IV {
    def keys: collection.Set[String] = m.keySet
    def apply(k: String): IV = m(k)
    def update(k: String, v: IV): Unit = m(k) = v
  }
  final case class IList(items: mutable.Buffer[String] = mutable.Buffer.empty) extends IV

  /** A fresh {list, links, links_title, links_ori_title} leaf node. */
  private def newLeaf(): IDict = {
    val d = IDict()
    d("list") = IList()
    d("links") = IList()
    d("links_title") = IList()
    d("links_ori_title") = IList()
    d
  }

  private def addThLinks(d: IDict, links: Seq[ResolvedLink]): Unit = {
    val tl = IDict()
    tl("links") = IList(links.map(_.url).toBuffer)
    tl("links_title") = IList(links.map(_.title).toBuffer)
    tl("links_ori_title") = IList(links.map(_.oriTitle).toBuffer)
    d("th_links") = tl
  }

  private def leafList(d: IDict): IList = d("list").asInstanceOf[IList]
  private def extendLinks(d: IDict, links: Seq[ResolvedLink]): Unit = {
    d("links").asInstanceOf[IList].items ++= links.map(_.url)
    d("links_title").asInstanceOf[IList].items ++= links.map(_.title)
    d("links_ori_title").asInstanceOf[IList].items ++= links.map(_.oriTitle)
  }

  private def styleOf(e: HElem): String = e.attr("style").getOrElse("")
  // style probes run for every td content of every parsed doc — the
  // leaf pipeline's hottest branch-dispatch path. Compile each pattern
  // once per JVM (executor-side object, so the cache is per-executor
  // like the codegen'd expression kernels), and skip the matcher
  // entirely for the common no-style-attr case.
  private val stylePatterns =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]
  private def hasStyle(e: HElem, re: String): Boolean = {
    val s = styleOf(e)
    s.nonEmpty && stylePatterns
      .computeIfAbsent(re, java.util.regex.Pattern.compile(_))
      .matcher(s).find()
  }

  /** get_links_title over a sequence of anchors (`zhwiki_leafs.py:238-271`),
    * skipping mw-selflink selflink anchors. */
  def resolveAnchors(pageUrl: String, basePreUrl: String, anchors: Seq[HElem]): Seq[ResolvedLink] =
    anchors.flatMap { a =>
      if (a.classes.contains("mw-selflink") && a.classes.contains("selflink")) None
      else {
        val href = a.attr("href").getOrElse("")
        val imgAlt = a.findFirst(_.name == "img").flatMap(_.attr("alt"))
        Some(canonicalizeLink(pageUrl, basePreUrl, href, a.text, a.attr("title"), a.classes, imgAlt))
      }
    }

  private def anchorsIn(e: HElem): Seq[HElem] = e.findByTag("a")

  /** `get_one_tag_content_br` (`zhwiki_leafs.py:282-314`) restricted:
    * br→'\n', strings→strRe, anchors→text+link, other tags→recurse.
    * (NavFrame/nested-table inside th are not in the restricted grammar.) */
  def tagContentBr(pageUrl: String, base: String, tag: HElem): (String, Seq[ResolvedLink]) = {
    val sb = new StringBuilder
    val links = mutable.Buffer.empty[ResolvedLink]
    tag.children.foreach {
      case HText(t) => sb.append(strRe(t))
      case e: HElem =>
        e.name match {
          case "br" => sb.append('\n')
          case "a" =>
            sb.append(strRe(e.text))
            links ++= resolveAnchors(pageUrl, base, Seq(e))
          case _ =>
            val (s, ls) = tagContentBr(pageUrl, base, e)
            sb.append(s)
            links ++= ls
        }
    }
    (strRe(sb.toString), links.toSeq)
  }

  /** stripped_strings joined with '\n' then strRe — the reference's
    * recurring `str_re("\n".join(list(x.stripped_strings)))`. */
  private def joinedStripped(e: HElem): String = strRe(e.strippedStrings.mkString("\n"))

  /** Links extended with the reference's NavFrame quirk: links_ori_title
    * receives links_TITLE (`zhwiki_leafs.py:433,472`). */
  private def extendLinksQuirk(d: IDict, links: Seq[ResolvedLink]): Unit = {
    d("links").asInstanceOf[IList].items ++= links.map(_.url)
    d("links_title").asInstanceOf[IList].items ++= links.map(_.title)
    d("links_ori_title").asInstanceOf[IList].items ++= links.map(_.title)
  }

  /** Plain repeat-key loop WITHOUT the empty_key mapping — the NavFrame
    * and table_td key dedups inline this (`:385-389,627-632`) instead of
    * calling check_repeat_key. */
  private def dedupKey(k: String, keys: collection.Set[String]): String = {
    var nk = k; var cnt = 2
    while (keys.contains(nk)) { nk = k + "_" + cnt; cnt += 1 }
    nk
  }

  private def imgEntry(d: IDict, e: HElem): Unit = { // `:745-757,885-896`
    var src = e.attr("src").getOrElse("")
    if (src.startsWith("//")) src = "https:" + src
    var alt = e.attr("alt").getOrElse("")
    if (alt.isEmpty) alt = src.split("wikipedia/").last
    d("links").asInstanceOf[IList].items += src
    d("links_title").asInstanceOf[IList].items += alt
    d("links_ori_title").asInstanceOf[IList].items += alt
  }

  /** `get_td_contents` (`zhwiki_leafs.py:316-918`).
    * Returns (dict or None, defaultTdHead, shouldUnderFirstKey,
    * isTableThBackground). */
  def tdContents(pageUrl: String, base: String, td: HElem)
      : Option[(IDict, String, Boolean, Boolean)] = {
    // drop pure-whitespace text children (reference `:318-322`)
    val contents = td.children.filter {
      case HText(t) => t.trim.nonEmpty
      case _        => true
    }
    if (contents.isEmpty) return None
    // template filter (`:331-335`)
    if (hasStyle(td, "background:\\s*#e6e9ff") && hasStyle(td, "text-align:\\s*right") &&
      hasStyle(td, "font-size:\\s*xx-small")) return None

    val d = newLeaf()
    var defaultHead = "td_content"
    var shouldUnderFirst = false
    var isTableThBg = false
    var listAdd = ""
    var tdMiddleB = ""

    def elemAt(i: Int): Option[HElem] = contents.lift(i).collect { case e: HElem => e }
    def directDivs(e: HElem): Vector[HElem] = e.childElems.filter(_.name == "div")

    // default_td_head shapes (`:337-345`)
    if (contents.length == 2 && elemAt(0).exists(_.name == "a") && elemAt(1).exists(_.name == "div"))
      defaultHead = "封面图片"
    else if (contents.length == 1 && elemAt(0).exists(e =>
        e.name == "a" && e.findFirst(_.name == "img").isDefined))
      defaultHead = "封面图片"
    else if (contents.length == 2 && directDivs(td).length == 2 &&
      directDivs(td).head.findFirst(_.name == "img").isDefined)
      defaultHead = "封面图片"
    else if (td.findFirst(e => e.name == "div" && e.classes.contains("thumbinner")).isDefined)
      defaultHead = "封面图片"

    if (styleOf(td).contains("border-top")) shouldUnderFirst = true // `:347-348`
    // sole div holding two direct divs, first with an img (`:349-352`)
    if (contents.length == 1 && elemAt(0).exists(e => e.name == "div" &&
      directDivs(e).length == 2 && directDivs(e).head.findFirst(_.name == "img").isDefined))
      shouldUnderFirst = true

    def targetDict(): IDict =
      if (tdMiddleB.isEmpty) d else d(tdMiddleB).asInstanceOf[IDict]

    // NavFrame content walk shared by the direct-NavFrame branches
    // (`:398-436` li loop, `:440-471` NavContent fallback) and the
    // descendant-NavFrames branch (`:579-610`). `tables` enables the
    // nested get_table_info_3 merge (direct branches only); `quirkOri`
    // selects the links_title-as-ori quirk (direct branches only).
    def navWalk(navLeaf: IDict, nodes: Seq[HtmlScanner.HNode],
        tables: Boolean, quirkOri: Boolean): Unit = {
      var add = ""
      nodes.foreach {
        case HText(t) => add += t.trim // plain strip, not str_re (`:409`)
        case e: HElem =>
          if (e.name == "br") {
            if (add.nonEmpty) { leafList(navLeaf).items += add; add = "" }
          } else if (e.name == "table" && tables) {
            val tmp = parse(pageUrl, base, e)
            tmp.m.foreach { case (k, v) =>
              navLeaf(checkRepeatKey(k, navLeaf.keys)) = v
            }
          } else {
            add += strRe(e.text)
            val anchors = if (e.name == "a") e +: anchorsIn(e) else anchorsIn(e)
            val rl = resolveAnchors(pageUrl, base, anchors)
            if (quirkOri) extendLinksQuirk(navLeaf, rl) else extendLinks(navLeaf, rl)
          }
      }
      if (add.nonEmpty) leafList(navLeaf).items += add
    }
    // per-li plainlist-or-li contents (`:400-405`)
    def navLis(navLeaf: IDict, ul: HElem, tables: Boolean, quirkOri: Boolean): Unit =
      ul.findByTag("li").foreach { li =>
        val nodes = li.findFirst(e => e.name == "div" && e.classes.contains("plainlist"))
          .map(_.children).getOrElse(li.children)
        navWalk(navLeaf, nodes, tables, quirkOri)
      }

    var firstContent = true
    contents.foreach { node =>
      node match {
        case HText(t) => listAdd += strRe(t)
        case e: HElem =>
          if (e.name == "br") { // `:361-367`; empty accumulator: no-op
            if (listAdd.nonEmpty) { leafList(targetDict()).items += listAdd; listAdd = "" }
          } else if (e.name == "div" && e.classes.contains("plainlinks") &&
            e.classes.contains("hlist") && e.classes.contains("navbar") &&
            e.classes.contains("mini")) {
            // navbar-mini template skipped outright (`:368-372`)
          } else if (e.name == "div" && e.classes.contains("NavFrame")) {
            // direct NavFrame (`:373-473`)
            defaultHead = "NavFrame"
            val navHeadTag = e.findFirst(x => x.name == "div" && x.classes.contains("NavHead"))
            if (navHeadTag.exists(h => styleOf(h).contains("background") &&
              hasStyle(h, "text-align:\\s*center"))) {
              shouldUnderFirst = true
              isTableThBg = true
            }
            // fails fast when NavHead is absent, like the reference's
            // unguarded .get_text() (`:383`)
            val navHead = dedupKey(strRe(navHeadTag.get.text), d.keys)
            val navLeaf = newLeaf()
            d(navHead) = navLeaf
            val ul = e.findFirst(x => x.name == "ul" && x.classes.contains("NavContent"))
              .orElse(e.findFirst(x => x.name == "div" && x.classes.contains("NavContent"))
                .map(_.findFirst(_.name == "ul"))
                .getOrElse(e.findFirst(_.name == "ul"))) // `:391-397`
            ul match {
              case Some(u) => navLis(navLeaf, u, tables = true, quirkOri = true)
              case None => // NavContent div fallback (`:440-471`)
                val nc = e.findFirst(x => x.name == "div" && x.classes.contains("NavContent")).get
                navWalk(navLeaf, nc.children, tables = true, quirkOri = true)
            }
          } else if (e.name == "p" && hasStyle(td, "width:\\s*50%")) {
            // width-50% p → middle key (`:475-479`, 1964年巴西政变)
            tdMiddleB = strRe(e.text)
            val sub = newLeaf()
            addThLinks(sub, resolveAnchors(pageUrl, base, anchorsIn(e)))
            d(tdMiddleB) = sub
          } else if (e.name == "ul" ||
            (e.name == "div" && (e.classes.contains("plainlist") || e.classes.contains("hlist")))) {
            // multi-li branch (`:480-503`)
            e.findByTag("li").foreach { li =>
              val liText = strRe(li.text)
              if (liText.nonEmpty) leafList(targetDict()).items += liText
              extendLinks(targetDict(), resolveAnchors(pageUrl, base, anchorsIn(li)))
            }
          } else if (e.name == "span" && e.classes.contains("street-address")) {
            // street-address span: local b-keyed sub-dicts (`:504-547`)
            var curB = ""
            var add = ""
            def bTarget(): IDict = if (curB.isEmpty) d else d(curB).asInstanceOf[IDict]
            e.children.foreach {
              case HText(t) => add += strRe(t)
              case c: HElem if c.name == "b" =>
                if (add.nonEmpty) { leafList(bTarget()).items += add; add = "" }
                curB = strRe(c.text)
                val sub = newLeaf()
                addThLinks(sub, resolveAnchors(pageUrl, base, anchorsIn(c)))
                d(curB) = sub
              case c: HElem =>
                add += strRe(c.text)
                val anchors = if (c.name == "a") c +: anchorsIn(c) else anchorsIn(c)
                extendLinks(bTarget(), resolveAnchors(pageUrl, base, anchors))
            }
            if (add.nonEmpty) leafList(bTarget()).items += add
          } else if (firstContent && e.name == "span" && e.findFirst(_.name == "b").isDefined) {
            // first-content span holding a <b> names the head (`:548-549`)
            defaultHead = strRe(e.text)
          } else if (e.name == "b") { // <b> sub-key (`:550-560`)
            tdMiddleB = strRe(e.text)
            val sub = newLeaf()
            addThLinks(sub, resolveAnchors(pageUrl, base, anchorsIn(e)))
            d(tdMiddleB) = sub
            if (firstContent && e.text.endsWith("：") && hasStyle(td, "text-align:\\s*center"))
              shouldUnderFirst = true
          } else if (firstContent &&
            e.findAll(x => x.name == "div" && x.classes.contains("NavFrame")).nonEmpty) {
            // descendant NavFrames (`:561-610`)
            if (!hasStyle(e, "display:\\s*none")) { // `:562-564` skip
              shouldUnderFirst = true
              e.findAll(x => x.name == "div" && x.classes.contains("NavFrame")).foreach { nf =>
                val navHead = dedupKey(
                  strRe(nf.findFirst(x => x.name == "div" && x.classes.contains("NavHead")).get.text),
                  d.keys)
                val navLeaf = newLeaf()
                d(navHead) = navLeaf
                nf.findFirst(x => x.name == "ul" && x.classes.contains("NavContent")).foreach {
                  u => navLis(navLeaf, u, tables = false, quirkOri = false)
                }
              }
            }
          } else if (e.name == "table") { // nested table (`:611-783`)
            e.findFirst(_.name == "tbody").foreach { tbody =>
              val allTrs = tbody.findByTag("tr")
              if (allTrs.length == 1 && tbody.findByTag("th").isEmpty) {
                // single-tr keyless table → table_td_N walk (`:617-768`)
                if (e.classes.contains("toccolours") || td.classes.contains("toccolours")) {
                  shouldUnderFirst = true
                  isTableThBg = true
                }
                allTrs.head.findByTag("td").foreach { ttd =>
                  // `:627-632`: seed key table_td_1, clashes continue
                  // from the BASE (table_td_2, table_td_3, …)
                  var tdKey = "table_td_1"
                  var tdCnt = 2
                  while (d.keys.contains(tdKey)) { tdKey = "table_td_" + tdCnt; tdCnt += 1 }
                  val tleaf = newLeaf()
                  d(tdKey) = tleaf
                  var tableB = ""
                  var tAdd = ""
                  def tTarget(): IDict =
                    if (tableB.isEmpty) tleaf else tleaf(tableB).asInstanceOf[IDict]
                  ttd.children.foreach {
                    case de: HElem if de.name == "div" => // `:640-737`
                      de.children.foreach {
                        case pe: HElem if pe.name == "p" => // `:643-685`
                          var add = ""
                          pe.children.foreach {
                            case HText(t) => add += strRe(t)
                            case be: HElem if be.name == "br" =>
                              if (add.nonEmpty) { leafList(tTarget()).items += add; add = "" }
                            case be: HElem if be.name == "b" =>
                              tableB = strRe(be.text)
                              tleaf(tableB) = newLeaf()
                            case be: HElem =>
                              add += strRe(be.text)
                              val anchors = if (be.name == "a") be +: anchorsIn(be) else anchorsIn(be)
                              extendLinks(tTarget(), resolveAnchors(pageUrl, base, anchors))
                          }
                          if (add.nonEmpty) leafList(tTarget()).items += add
                        case ue: HElem if ue.name == "ul" => // `:686-706`
                          if (tableB.isEmpty) {
                            var ub = "table_ul_1" // same seed/base split
                            var uc = 2
                            while (tleaf.keys.contains(ub)) { ub = "table_ul_" + uc; uc += 1 }
                            tableB = ub
                            tleaf(tableB) = newLeaf()
                          }
                          ue.findByTag("li").foreach { li =>
                            val sub = tleaf(tableB).asInstanceOf[IDict]
                            leafList(sub).items += strRe(li.text)
                            extendLinks(sub, resolveAnchors(pageUrl, base, anchorsIn(li)))
                          }
                        case HText(t) => // bare string → direct list row (`:707-714`)
                          val txt = strRe(t)
                          if (txt.nonEmpty) leafList(tTarget()).items += txt
                        case oe: HElem => // other tag → text + links (`:715-737`)
                          val txt = strRe(oe.text)
                          if (txt.nonEmpty) leafList(tTarget()).items += txt
                          val anchors = if (oe.name == "a") oe +: anchorsIn(oe) else anchorsIn(oe)
                          extendLinks(tTarget(), resolveAnchors(pageUrl, base, anchors))
                      }
                    case HText(t) => tAdd += strRe(t) // `:738-740`
                    case be: HElem if be.name == "br" => // `:741-743`
                      if (tAdd.nonEmpty) { leafList(tleaf).items += tAdd; tAdd = "" }
                    case ie: HElem if ie.name == "img" => imgEntry(tleaf, ie) // `:745-754`
                    case oe: HElem => // `:755-765`
                      tAdd += strRe(oe.text)
                      val anchors = if (oe.name == "a") oe +: anchorsIn(oe) else anchorsIn(oe)
                      extendLinks(tleaf, resolveAnchors(pageUrl, base, anchors))
                  }
                  if (tAdd.nonEmpty) leafList(tleaf).items += tAdd
                }
              } else {
                // th/td table → get_table_info_3 keys attached via
                // check_repeat_key (`:769-775`; identical key-by-key
                // semantics to our_merge_dict into a non-empty dict)
                val tmp = parse(pageUrl, base, e)
                tmp.m.foreach { case (k, v) => d(checkRepeatKey(k, d.keys)) = v }
                // first-tr th background / table background (`:776-783`)
                val firstTrTh = allTrs.headOption.flatMap(_.findFirst(_.name == "th"))
                if (firstTrTh.exists(t => styleOf(t).contains("background")) ||
                  styleOf(e).contains("background")) {
                  shouldUnderFirst = true
                  isTableThBg = true
                }
              }
            }
          } else if (contents.length == 1 && firstContent && e.name == "div" &&
            e.childElems.exists(_.name == "b")) {
            // sole div with a direct <b> child (`:841-884`)
            e.children.foreach {
              case HText(t) => listAdd += t.trim // plain strip (`:846-848`)
              case c: HElem if c.name == "br" =>
                if (listAdd.nonEmpty) { leafList(d).items += listAdd; listAdd = "" }
              case c: HElem if c.name == "b" =>
                defaultHead = strRe(c.text)
                if (defaultHead.contains("网站") || defaultHead.contains("網站"))
                  shouldUnderFirst = true
                addThLinks(d, resolveAnchors(pageUrl, base, anchorsIn(c)))
              case c: HElem =>
                var txt = strRe(c.text)
                if (c.name == "div" && c.classes.contains("NavFrame") && listAdd.nonEmpty)
                  txt = "\n" + txt // `:869-871` quirk
                listAdd += txt
                val anchors = if (c.name == "a") c +: anchorsIn(c) else anchorsIn(c)
                extendLinks(d, resolveAnchors(pageUrl, base, anchors))
            }
            if (listAdd.nonEmpty) { leafList(d).items += listAdd; listAdd = "" }
          } else if (e.name == "img") { // img entry (`:885-896`)
            imgEntry(d, e)
          } else { // generic inline fallthrough (`:897-910`)
            val (txt0, _) = tagContentBr(pageUrl, base, e)
            var txt = strRe(txt0)
            if (e.name == "div" && e.classes.contains("NavFrame") && listAdd.nonEmpty)
              txt = "\n" + txt // `:899-903` (shadowed by the direct
            // NavFrame branch above, as in the reference's elif chain)
            listAdd += txt
            val anchors =
              if (e.name == "a") e +: anchorsIn(e) else anchorsIn(e)
            extendLinks(d, resolveAnchors(pageUrl, base, anchors))
          }
      }
      firstContent = false // after EVERY content incl. strings (`:912`)
    }
    if (listAdd.nonEmpty) leafList(targetDict()).items += listAdd // `:913-917`
    Some((d, defaultHead, shouldUnderFirst, isTableThBg))
  }

  /** `get_table_info_3` (`zhwiki_leafs.py:930-1370`) restricted subset. */
  def parse(pageUrl: String, basePreUrl: String, table: HElem): IDict = {
    val tot = IDict()
    val tbody = table.childElems.find(_.name == "tbody").getOrElse(return tot)
    val trs = tbody.childElems.filter(_.name == "tr")

    var firstKey = ""
    var secondKey = ""
    var secondKeyBackground = false
    var thirdKey = ""
    var fourthKey = ""
    var firstTr = true
    var tdToThirdKey = false
    var tdToSecondKey = false

    def dictAt(path: Seq[String]): IDict =
      path.foldLeft(tot: IDict)((d, k) => d(k).asInstanceOf[IDict])

    // caption branch (`:943-953`)
    table.childElems.find(_.name == "caption").foreach { cap =>
      val capStr = joinedStripped(cap)
      val links = resolveAnchors(pageUrl, basePreUrl, anchorsIn(cap))
      firstKey = capStr
      secondKey = ""; thirdKey = ""; fourthKey = ""
      val leaf = newLeaf()
      addThLinks(leaf, links)
      tot(firstKey) = leaf
    }

    trs.foreach { tr =>
      val ths = tr.childElems.filter(_.name == "th")
      val tds = tr.childElems.filter(_.name == "td")
      val th = ths.headOption

      if (ths.length > 1) { // multi-th row (`:961-980`)
        firstKey = "table_content"
        secondKey = ""; thirdKey = ""; fourthKey = ""
        tot(firstKey) = newLeaf()
        ths.foreach { curTh =>
          val s = joinedStripped(curTh)
          val links = resolveAnchors(pageUrl, basePreUrl, anchorsIn(curTh))
          secondKey = checkRepeatKey(s, dictAt(Seq(firstKey)).keys)
          thirdKey = ""; fourthKey = ""
          val leaf = newLeaf()
          addThLinks(leaf, links)
          dictAt(Seq(firstKey))(secondKey) = leaf
        }
      }

      if (th.isDefined && tds.isEmpty && ths.length == 1) { // th-only (`:982-1059`)
        val t = th.get
        val (thStr, thLinks) = tagContentBr(pageUrl, basePreUrl, t)
        if (firstKey.isEmpty) {
          firstKey = thStr
          secondKey = ""; thirdKey = ""; fourthKey = ""
          tdToThirdKey = false; tdToSecondKey = false
          val leaf = newLeaf()
          addThLinks(leaf, thLinks)
          tot(firstKey) = leaf
        } else {
          val bgLike = styleOf(t).contains("background") ||
            t.classes.contains("navbox-title") ||
            (hasStyle(t, "text-align:\\s*center") && !hasStyle(t, "text-align:\\s*left"))
          if (bgLike) {
            secondKeyBackground = true
            secondKey = checkRepeatKey(thStr, dictAt(Seq(firstKey)).keys)
            thirdKey = ""; fourthKey = ""
            tdToThirdKey = false; tdToSecondKey = false
            val leaf = newLeaf()
            addThLinks(leaf, thLinks)
            dictAt(Seq(firstKey))(secondKey) = leaf
          } else if (secondKeyBackground) {
            thirdKey = checkRepeatKey(thStr, dictAt(Seq(firstKey, secondKey)).keys)
            fourthKey = ""
            tdToThirdKey = false
            val leaf = newLeaf()
            addThLinks(leaf, thLinks)
            dictAt(Seq(firstKey, secondKey))(thirdKey) = leaf
          } else {
            secondKey = checkRepeatKey(thStr, dictAt(Seq(firstKey)).keys)
            thirdKey = ""; fourthKey = ""
            tdToThirdKey = false; tdToSecondKey = false
            val leaf = newLeaf()
            addThLinks(leaf, thLinks)
            dictAt(Seq(firstKey))(secondKey) = leaf
          }
        }
      } else if (th.isDefined && ths.length == 1) { // th+td (`:1061-1129`)
        val t = th.get
        val thStr = joinedStripped(t)
        val thLinks = resolveAnchors(pageUrl, basePreUrl, anchorsIn(t))
        if (thStr.startsWith("•")) {
          if (secondKeyBackground) {
            if (thirdKey.nonEmpty) {
              fourthKey = checkRepeatKey(thStr, dictAt(Seq(firstKey, secondKey, thirdKey)).keys)
              val leaf = newLeaf()
              addThLinks(leaf, thLinks)
              dictAt(Seq(firstKey, secondKey, thirdKey))(fourthKey) = leaf
            } else {
              thirdKey = checkRepeatKey(thStr, dictAt(Seq(firstKey, secondKey)).keys)
              fourthKey = ""
              tdToThirdKey = false
              val leaf = newLeaf()
              addThLinks(leaf, thLinks)
              dictAt(Seq(firstKey, secondKey))(thirdKey) = leaf
            }
          } else {
            thirdKey = checkRepeatKey(thStr, dictAt(Seq(firstKey, secondKey)).keys)
            fourthKey = ""
            tdToThirdKey = false
            val leaf = newLeaf()
            addThLinks(leaf, thLinks)
            dictAt(Seq(firstKey, secondKey))(thirdKey) = leaf
          }
        } else {
          if (secondKeyBackground) {
            thirdKey = checkRepeatKey(thStr, dictAt(Seq(firstKey, secondKey)).keys)
            fourthKey = ""
            tdToThirdKey = false
            val leaf = newLeaf()
            addThLinks(leaf, thLinks)
            dictAt(Seq(firstKey, secondKey))(thirdKey) = leaf
          } else {
            if (firstKey.isEmpty) {
              firstKey = "table_content"
              tot(firstKey) = newLeaf()
            }
            secondKey = checkRepeatKey(thStr, dictAt(Seq(firstKey)).keys)
            thirdKey = ""; fourthKey = ""
            tdToThirdKey = false; tdToSecondKey = false
            val leaf = newLeaf()
            addThLinks(leaf, thLinks)
            dictAt(Seq(firstKey))(secondKey) = leaf
          }
        }
      }

      // td loop (`:1131-1368`) incl. the td-as-key special cases
      // (`:1160-1327`): real-wiki templates where a TD, not a TH,
      // opens a new key level. A fresh key leaf from a td:
      def tdKeyLeaf(e: HElem): (String, IDict) = {
        val leaf = newLeaf()
        addThLinks(leaf, resolveAnchors(pageUrl, basePreUrl, anchorsIn(e)))
        (joinedStripped(e), leaf)
      }
      var firstTd = true
      tds.foreach { td =>
        var handled = false
        if (firstKey.isEmpty) {
          if (firstTr && styleOf(td).contains("background")) { // `:1135-1147`
            firstKey = joinedStripped(td)
            secondKey = ""; thirdKey = ""; fourthKey = ""
            val leaf = newLeaf()
            addThLinks(leaf, resolveAnchors(pageUrl, basePreUrl, anchorsIn(td)))
            tot(firstKey) = leaf
            firstTd = false
            handled = true
          } else { // `:1148-1153`
            firstKey = "table_content"
            secondKey = ""; thirdKey = ""; fourthKey = ""
            tot(firstKey) = newLeaf()
          }
        }
        // cleaned contents (reference `:1154-1159`): drop blank strings
        lazy val cleanedContents = td.children.filter {
          case HText(t) => t.trim.nonEmpty
          case _        => true
        }
        // single centered bold background td → SECOND key (`:1161-1180`,
        // the 中央军委...主要领导 template)
        if (!handled && tds.length == 1 && cleanedContents.length == 1 &&
          td.findFirst(_.name == "b").isDefined &&
          styleOf(td).contains("background") && hasStyle(td, "text-align:\\s*center")) {
          val (s, leaf) = tdKeyLeaf(td)
          secondKey = checkRepeatKey(s, dictAt(Seq(firstKey)).keys)
          secondKeyBackground = true
          thirdKey = ""; fourthKey = ""
          dictAt(Seq(firstKey))(secondKey) = leaf
          firstTd = false; handled = true
        }
        // 2-td row whose first td carries a DIRECT-child <b> → third key
        // (`:1183-1203`, the 09V型核潜艇 template); falls through when no
        // second key is open (the reference only acts inside the guard)
        if (!handled && th.isEmpty && firstTd && tds.length == 2 &&
          td.childElems.exists(_.name == "b") && secondKey.nonEmpty) {
          val (s, leaf) = tdKeyLeaf(td)
          thirdKey = checkRepeatKey(s, dictAt(Seq(firstKey, secondKey)).keys)
          fourthKey = ""
          dictAt(Seq(firstKey, secondKey))(thirdKey) = leaf
          firstTd = false; tdToThirdKey = true; handled = true
        }
        // same shape keyed by a direct-child span.nowrap (`:1205-1225`,
        // the 北美水獺 template)
        if (!handled && th.isEmpty && firstTd && tds.length == 2 &&
          td.childElems.exists(e => e.name == "span" && e.classes.contains("nowrap")) &&
          secondKey.nonEmpty) {
          val (s, leaf) = tdKeyLeaf(td)
          thirdKey = checkRepeatKey(s, dictAt(Seq(firstKey, secondKey)).keys)
          fourthKey = ""
          dictAt(Seq(firstKey, secondKey))(thirdKey) = leaf
          firstTd = false; tdToThirdKey = true; handled = true
        }
        // #f0f0f0-background TABLE: 2-td rows key on their first td —
        // third key under an open th-set second key, else a new second
        // key per row (`:1227-1262`, the 1,3-丙磺酸内酯 chembox)
        if (!handled && th.isEmpty && firstTd && tds.length == 2 &&
          hasStyle(table, "background-color:\\s*#f0f0f0")) {
          val (s, leaf) = tdKeyLeaf(td)
          if (secondKey.nonEmpty && !tdToSecondKey) {
            thirdKey = checkRepeatKey(s, dictAt(Seq(firstKey, secondKey)).keys)
            fourthKey = ""
            dictAt(Seq(firstKey, secondKey))(thirdKey) = leaf
            tdToSecondKey = false; tdToThirdKey = true
          } else {
            secondKey = checkRepeatKey(s, dictAt(Seq(firstKey)).keys)
            thirdKey = ""; fourthKey = ""
            dictAt(Seq(firstKey))(secondKey) = leaf
            tdToSecondKey = true; tdToThirdKey = false
          }
          firstTd = false; handled = true
        }
        // centered bold #cddeff td → second key, no row-shape guard
        // (`:1264-1283`, the 北京市-市象征 template)
        if (!handled && hasStyle(td, "text-align:\\s*center") &&
          hasStyle(td, "background-color:\\s*#cddeff") &&
          hasStyle(td, "font-weight:\\s*bold")) {
          val (s, leaf) = tdKeyLeaf(td)
          secondKey = checkRepeatKey(s, dictAt(Seq(firstKey)).keys)
          thirdKey = ""; fourthKey = ""
          dictAt(Seq(firstKey))(secondKey) = leaf
          secondKeyBackground = true
          firstTd = false; handled = true
        }
        // tr.mergedrow, 2 tds: first td → third key under an open second
        // key, else a new second key (`:1285-1311`)
        if (!handled && firstTd && tds.length == 2 && tr.classes.contains("mergedrow")) {
          val (s, leaf) = tdKeyLeaf(td)
          if (secondKey.nonEmpty) {
            thirdKey = checkRepeatKey(s, dictAt(Seq(firstKey, secondKey)).keys)
            fourthKey = ""
            dictAt(Seq(firstKey, secondKey))(thirdKey) = leaf
          } else {
            secondKey = checkRepeatKey(s, dictAt(Seq(firstKey)).keys)
            thirdKey = ""; fourthKey = ""
            dictAt(Seq(firstKey))(secondKey) = leaf
            tdToSecondKey = true; tdToThirdKey = false
          }
          firstTd = false; handled = true
        }
        // tr.mergedrow, single td with a <b> → second key (`:1313-1327`,
        // the 浊水溪-支流 template)
        if (!handled && firstTd && tds.length == 1 && tr.classes.contains("mergedrow") &&
          td.findFirst(_.name == "b").isDefined) {
          val (s, leaf) = tdKeyLeaf(td)
          secondKey = checkRepeatKey(s, dictAt(Seq(firstKey)).keys)
          thirdKey = ""; fourthKey = ""
          dictAt(Seq(firstKey))(secondKey) = leaf
          firstTd = false; handled = true
        }
        if (!handled) {
          tdContents(pageUrl, basePreUrl, td) match {
            case None => firstTd = false
            case Some((tdDict, head, shouldUnderFirst, isTableThBg)) =>
              // attach with repeat-suffix at the chosen level
              // (`:1336-1367`). The reference's suffix scan (`:1339`)
              // and attach (`:1358`) use slightly DIFFERENT conditions
              // — the suffix level ignores td_to_third_key — and that
              // asymmetry is reproduced here. is_table_th_background
              // (NavFrame-head / toccolours / nested-th-background
              // branches) forces first-level attach even under an open
              // background second key; so does the 若非注明
              // data-source footer.
              val underFirst = secondKey.isEmpty ||
                (shouldUnderFirst && !secondKeyBackground) ||
                (shouldUnderFirst && isTableThBg) ||
                td.text.contains("若非注明，所有数据均出自")
              val suffixDict: IDict =
                if (underFirst) dictAt(Seq(firstKey))
                else if (thirdKey.isEmpty || (th.isEmpty && secondKeyBackground))
                  dictAt(Seq(firstKey, secondKey))
                else if (fourthKey.isEmpty) dictAt(Seq(firstKey, secondKey, thirdKey))
                else dictAt(Seq(firstKey, secondKey, thirdKey, fourthKey))
              val target: IDict =
                if (underFirst) dictAt(Seq(firstKey))
                else if (thirdKey.isEmpty || (th.isEmpty && secondKeyBackground && !tdToThirdKey))
                  dictAt(Seq(firstKey, secondKey))
                else if (fourthKey.isEmpty) dictAt(Seq(firstKey, secondKey, thirdKey))
                else dictAt(Seq(firstKey, secondKey, thirdKey, fourthKey))
              var key = head
              var cnt = 2
              while (suffixDict.keys.contains(key)) { key = head + "_" + cnt; cnt += 1 }
              target(key) = tdDict
              firstTd = false
          }
        }
      }
      firstTr = false
    }
    cleanBlank(tot).asInstanceOf[IDict]
  }

  /** `clean_blank_table_info` (`zhwiki_leafs.py:218-231`): drop empty
    * lists everywhere; drop empty sub-dicts only for th_links /
    * td_content* / table_td* keys. */
  def cleanBlank(d: IDict): IV = {
    val out = IDict()
    d.m.foreach { case (k, v) =>
      v match {
        case sub: IDict =>
          val cleaned = cleanBlank(sub).asInstanceOf[IDict]
          val dropEligible =
            k == "th_links" || k.startsWith("td_content") || k.startsWith("table_td")
          if (!(cleaned.m.isEmpty && dropEligible)) out(k) = cleaned
        case l: IList =>
          if (l.items.nonEmpty) out(k) = l
      }
    }
    out
  }

  /** Python-style JSON: `json.dumps(..., ensure_ascii=False, indent=4)`
    * (`zhwiki_leafs.py:1420`) — insertion order preserved. */
  def toJson(v: IV, indent: Int = 0): String = {
    val pad = " " * indent
    val pad2 = " " * (indent + 4)
    def esc(s: String): String = {
      val sb = new StringBuilder
      s.foreach {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.toString
    }
    v match {
      case IDict(m) =>
        if (m.isEmpty) "{}"
        else
          m.map { case (k, vv) => s"""$pad2"${esc(k)}": ${toJson(vv, indent + 4)}""" }
            .mkString("{\n", ",\n", s"\n$pad}")
      case IList(items) =>
        if (items.isEmpty) "[]"
        else items.map(i => s"""$pad2"${esc(i)}"""").mkString("[\n", ",\n", s"\n$pad]")
    }
  }
}
