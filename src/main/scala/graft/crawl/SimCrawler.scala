package graft.crawl

import scala.collection.mutable
import graft.functions.UrlFunctions.originOf
import graft.html.CategoryExtractor
import graft.html.CategoryExtractor.{Page, Subcat, SubcatNext, PageNext}

/** Single-threaded oracle crawler — the executable spec of the
  * reference frontier BFS (`zhwiki_all.py:428-501`, the live
  * `get_list_from_csv_3` path). The Spark engine must match its output
  * EXACTLY: frontier row order (Tot_urls/CSV order), crawl order (queue
  * pop order), and the final URL-seen set (SURVEY.md §7.3, the
  * BASELINE.json acceptance bar).
  *
  * Semantics preserved verbatim:
  *  - FIFO queue; every popped URL is fetched (None → continue);
  *  - subcat rows appended UNCONDITIONALLY; enqueue only if unseen AND
  *    not the blocked category; seen-add even when blocked (`:458-463`);
  *  - next-page anchors (both sections): row + enqueue-if-unseen, NO
  *    blocklist check (`:465-474,487-496`);
  *  - article rows deduped against the GLOBAL row list only — in-page
  *    duplicates pass (J2 quirk, `:484`); articles never enter seen;
  *  - robots-denied URLs behave like fetch failures (north-rule
  *    addition, shared with the engine via the same RobotsPolicy).
  */
object SimCrawler {

  final case class FrontierRow(url: String, title: String, preUrl: String, isleaf: Int)

  final case class CrawlResult(
      rows: Vector[FrontierRow],        // Tot_urls order == CSV order
      crawlOrder: Vector[String],       // queue pop order (fetch attempts)
      seen: Set[String]                 // final viewed set
  )

  def crawl(store: PageStore, blockedUrls: Set[String] = Set(PageStore.BlockedUrl)): CrawlResult = {
    val seeds = store.seeds
    val rows = mutable.ArrayBuffer.empty[FrontierRow]
    val rowSet = mutable.HashSet.empty[FrontierRow] // fast `in Tot_urls`
    val viewed = mutable.HashSet.empty[String]
    val queue = mutable.Queue.empty[String]
    val crawlOrder = mutable.ArrayBuffer.empty[String]

    // seed init (`zhwiki_all.py:406-413`): all rows recorded + viewed;
    // only isleaf==0 rows enter the queue
    seeds.foreach { case (url, title, pre, isleaf) =>
      val r = FrontierRow(url, title, pre, isleaf)
      rows += r; rowSet += r
      viewed += url
      if (isleaf == 0) queue += url
    }

    while (queue.nonEmpty) {
      val cur = queue.dequeue()
      crawlOrder += cur
      store.fetch(cur) match {
        case None => // 404/robots: continue (`:447-448`)
        case Some(html) =>
          val batch = mutable.ArrayBuffer.empty[FrontierRow]
          CategoryExtractor.extract(originOf(cur), html).foreach { l =>
            l.section match {
              case Subcat =>
                batch += FrontierRow(l.url, l.title, cur, 0)
                if (!viewed.contains(l.url)) {
                  if (!blockedUrls.contains(l.url)) queue += l.url
                  viewed += l.url
                }
              case SubcatNext | PageNext =>
                batch += FrontierRow(l.url, l.title, cur, 0)
                if (!viewed.contains(l.url)) {
                  queue += l.url
                  viewed += l.url
                }
              case Page =>
                val r = FrontierRow(l.url, l.title, cur, 1)
                if (!rowSet.contains(r)) batch += r // J2: global check only
            }
          }
          rows ++= batch
          batch.foreach(rowSet += _)
      }
    }
    CrawlResult(rows.toVector, crawlOrder.toVector, viewed.toSet)
  }
}
