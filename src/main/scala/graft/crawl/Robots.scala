package graft.crawl

import graft.functions.UrlFunctions.hostOf

/** Minimal robots.txt policy: per-host disallow prefix lists.
  *
  * The reference has NO robots handling (it spoofs a browser UA through
  * a proxy, `zhwiki_all.py:17-23`); the north rule requires it, so the
  * policy is part of the crawl spec: both the oracle SimCrawler and the
  * Spark engine consult the same policy, and a disallowed URL behaves
  * like a fetch failure (popped, no content, no discoveries).
  *
  * At scale this is a broadcast map host→rules refreshed per epoch;
  * here it is an immutable value carried into the fetch stage.
  */
final case class RobotsPolicy(disallow: Map[String, Seq[String]]) extends Serializable {
  def allowed(url: String): Boolean = {
    val host = hostOf(url)
    disallow.get(host) match {
      case None => true
      case Some(prefixes) =>
        val path = {
          val i = url.indexOf("://")
          val rest = if (i == -1) url else url.substring(i + 3)
          val s = rest.indexOf('/')
          if (s == -1) "/" else rest.substring(s)
        }
        !prefixes.exists(path.startsWith)
    }
  }
}

object RobotsPolicy {
  val allowAll: RobotsPolicy = RobotsPolicy(Map.empty)

  /** Parse a (restricted) robots.txt body: `Disallow: <prefix>` lines,
    * single `User-agent: *` group — the fixture grammar. */
  def parse(host: String, body: String): RobotsPolicy =
    RobotsPolicy(Map(host -> body.linesIterator
      .map(_.trim)
      .filter(_.toLowerCase.startsWith("disallow:"))
      .map(_.substring("disallow:".length).trim)
      .filter(_.nonEmpty)
      .toSeq))

  def merge(ps: Seq[RobotsPolicy]): RobotsPolicy =
    RobotsPolicy(ps.flatMap(_.disallow).toMap)
}
