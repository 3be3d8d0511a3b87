package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Entities, HtmlDom, UrlNormalizer}

/** XML sitemap source (sitemaps.org protocol, public): the third
  * standard frontier-seed source next to page outlinks and RSS/Atom
  * feeds ([[FeedSource]]). Parses `<urlset>` documents into seed
  * entries (loc / lastmod / priority) and `<sitemapindex>` documents
  * into nested-sitemap references (which a crawl fetches and expands
  * in the next wave — the same two-level discovery the protocol
  * defines).
  *
  * The parser is the engine's own [[HtmlDom]] in XML mode — no new
  * dependency, same forgiving semantics as the feed parser: malformed
  * input yields the entries that parse, never a throw. In the Spark
  * pipeline sitemaps explode into entries with a flatMap (the UDTF
  * analog, like [[FeedSource.entries]]); lastmod feeds the same D3
  * watermark rule, priority maps onto the frontier's priority score.
  *
  * Scale shape: parsing is per-row map work (no shuffle); the entry
  * explosion is bounded by the protocol itself (≤ 50,000 urls per
  * sitemap file), so no single input row can skew a partition.
  */
object SitemapSource {

  final case class SitemapEntry(
      sitemapUrl: String,
      url: String,
      /** epoch ms of <lastmod> (date-only = UTC midnight); -1 absent. */
      lastmodMs: Long,
      /** <priority> in basis points (0.5 default per the protocol). */
      priorityBp: Int,
      /** true for <sitemapindex>/<sitemap> children — fetch-and-expand
        * references, not page seeds. */
      isNestedSitemap: Boolean)

  /** lastmod parse: full ISO-8601 datetimes via [[FeedSource
    * .parseDateMs]], plus the protocol's bare-date form (W3C datetime
    * allows YYYY-MM-DD) at UTC midnight.
    */
  def parseLastmodMs(s: String): Long = {
    val t = s.trim
    if (t.isEmpty) return -1L
    try java.time.LocalDate.parse(t)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    catch { case _: Exception => FeedSource.parseDateMs(t) }
  }

  private def textOf(e: HtmlDom.Elem, name: String): String =
    e.findFirst(Set(name)).map(el =>
      Entities.decode(el.textNodes.map(_.value).mkString("").trim)).getOrElse("")

  /** Parse one sitemap document (urlset or sitemapindex). Pure. */
  def parseSitemap(xml: String, sitemapUrl: String): Seq[SitemapEntry] = {
    val doc = HtmlDom.parse(xml, xmlMode = true)
    def entryOf(el: HtmlDom.Elem, nested: Boolean): Option[SitemapEntry] = {
      val loc = textOf(el, "loc")
      if (loc.isEmpty) None
      else UrlNormalizer.canonicalize(loc, site = Some(sitemapUrl)).map { u =>
        val prio = textOf(el, "priority")
        val bp =
          if (prio.isEmpty) 5000
          else try math.round(prio.toDouble * 10000).toInt
          catch { case _: Exception => 5000 }
        SitemapEntry(sitemapUrl, u, parseLastmodMs(textOf(el, "lastmod")),
          math.max(0, math.min(10000, bp)), nested)
      }
    }
    doc.findAll(Set("url")).flatMap(entryOf(_, nested = false)) ++
      doc.findAll(Set("sitemap")).flatMap(entryOf(_, nested = true))
  }

  /** Explode a DataFrame of sitemap documents (sitemap_url, xml) into
    * entries; in-batch URL dedup included (D4), deterministic keeper
    * (min by (sitemapUrl, url) — dropDuplicates would be
    * partition-order dependent across the two entry kinds).
    */
  def entries(spark: SparkSession, sitemaps: DataFrame): Dataset[SitemapEntry] = {
    import spark.implicits._
    val ord = Ordering.by((e: SitemapEntry) =>
      (e.sitemapUrl, e.lastmodMs, e.priorityBp))
    sitemaps.select(col("sitemap_url"), col("xml"))
      .as[(String, String)]
      .flatMap { case (u, xml) => parseSitemap(xml, u) }
      .groupByKey(_.url)
      .reduceGroups((a, b) => if (ord.lteq(a, b)) a else b)
      .map(_._2)
  }
}
