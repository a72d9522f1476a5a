package graft.functions

import java.net.{URLDecoder, URLEncoder}

/** Pure URL functions — canonicalization, building, sanitization —
  * mirroring the reference's link handling branch-for-branch.
  */
object UrlFunctions {

  /** Percent-decode UTF-8 (Python `unquote`). Python's unquote leaves
    * '+' alone (unlike unquote_plus / Java URLDecoder), so protect it. */
  def unquote(s: String): String =
    URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")

  /** Percent-encode UTF-8 like Python `quote` (safe = "/"): space →
    * %20 (not '+'), '/' kept. Used for title→URL building
    * (`zhwiki_leafs.py:1758`). */
  def quote(s: String): String =
    URLEncoder
      .encode(s, "UTF-8")
      .replace("+", "%20")
      .replace("%2F", "/")
      .replace("%7E", "~")
      .replace("*", "%2A")

  /** `'https://zh.wikipedia.org/wiki/' + quote(title)` — title-file
    * source URL building (`zhwiki_leafs.py:1751-1759`). */
  def buildWikiUrl(base: String, title: String): String =
    base + "/wiki/" + quote(title)

  /** Host of an absolute URL (for host-hash partitioning / politeness). */
  def hostOf(url: String): String = {
    val noScheme = url.indexOf("://") match {
      case -1 => url
      case i  => url.substring(i + 3)
    }
    val end = noScheme.indexWhere(c => c == '/' || c == '?' || c == '#')
    if (end == -1) noScheme else noScheme.substring(0, end)
  }

  /** Scheme+authority origin of an absolute URL (the base the reference
    * hard-codes as 'https://zh.wikipedia.org'; generalized so multi-host
    * synthetic webs resolve relative hrefs against their own origin). */
  def originOf(url: String): String = {
    val i = url.indexOf("://")
    if (i == -1) return url
    val rest = url.substring(i + 3)
    val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    if (end == -1) url else url.substring(0, i + 3 + end)
  }

  /** One resolved link: canonical URL + display title + original title.
    * Mirrors the parallel lists built by `get_links_title`
    * (`zhwiki_leafs.py:238-271`). */
  final case class ResolvedLink(url: String, title: String, oriTitle: String)

  /** Canonicalize one anchor exactly like `get_links_title`
    * (`zhwiki_leafs.py:238-271`), one anchor at a time:
    *  - `#cite_note` / `#/map` fragments resolve against the PAGE url;
    *  - protocol-relative `//x` → `https:` + href;
    *  - absolute `http...` passes through;
    *  - `/wiki/X` → basePreUrl + href, oriTitle = unquote(X) minus a
    *    leading `File:`;
    *  - anything else → basePreUrl + href.
    * Title fallback chain: strRe(anchor text) → unquote(title attr) →
    * img alt (class `image`) → 'mw-kartographer-map' (class
    * `mw-kartographer-map`) → last path segment of the resolved link.
    */
  def canonicalizeLink(
      pageUrl: String,
      basePreUrl: String,
      href: String,
      anchorText: String,
      titleAttr: Option[String],
      classes: Set[String],
      imgAlt: Option[String]
  ): ResolvedLink = {
    var link = basePreUrl + href
    var oriTitle = ""
    if (href.contains("#cite_note") || href.contains("#/map")) {
      link = pageUrl + href
    } else if (href.startsWith("//")) {
      link = "https:" + href
    } else if (href.startsWith("http")) {
      link = href
    } else if (href.startsWith("/wiki/")) {
      oriTitle = unquote(href.substring(6))
      if (oriTitle.startsWith("File:")) oriTitle = oriTitle.substring(5)
    }
    var title = TextNorm.strRe(anchorText)
    if (title.isEmpty) {
      titleAttr match {
        case Some(t) => title = unquote(t)
        case None =>
          if (classes.contains("image")) title = imgAlt.getOrElse("")
          else if (classes.contains("mw-kartographer-map"))
            title = "mw-kartographer-map"
      }
      if (title.isEmpty) title = link.split('/').last
    }
    if (oriTitle.isEmpty) oriTitle = title
    ResolvedLink(link, title, oriTitle)
  }

  /** Narrow filename sanitizer used for the crawled-check key
    * (`zhwiki_leafs.py:113-116`): only ':' and '/'. */
  def sanitizeFilenameNarrow(name: String): String =
    name.replace(":", "-").replace("/", "--")

  /** Wide sanitizer used by pipeline_save (`zhwiki_leafs.py:1374-1384`):
    * strip()s first, then 8 single-char replacements + 2 double. The two
    * variants intentionally differ — a reference fidelity quirk. */
  def sanitizeFilenameWide(name: String): String =
    name.trim
      .replace(":", "-")
      .replace("?", "-")
      .replace("*", "-")
      .replace("\"", "-")
      .replace("<", "-")
      .replace(">", "-")
      .replace(".", "-")
      .replace("|", "-")
      .replace("/", "--")
      .replace("\\", "--")
}
