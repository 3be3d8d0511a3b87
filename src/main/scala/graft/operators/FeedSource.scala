package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Entities, HtmlDom, UrlNormalizer}

/** RSS/Atom feed source (reference: crawler/connectors/rssconnector.py:29-92):
  * parse a feed document into entries (one frontier task per entry)
  * and apply the timestamp-watermark incremental rule — skip entries
  * whose published time is ≤ the stored per-feed max
  * (crawler/utils/sessioninfomanager.py:117-138, SURVEY.md §2.4 D3).
  *
  * The parser is the engine's own [[HtmlDom]] in XML-ish mode: RSS 2.0
  * `<item>` and Atom `<entry>` elements, title/link/pubDate|updated
  * fields, entity-decoded. In the Spark pipeline feeds explode into
  * entries with a flatMap — the UDTF analog (SURVEY.md §2.10).
  */
object FeedSource {

  final case class FeedEntry(
      feedUrl: String,
      url: String,
      title: String,
      publishedMs: Long)

  private val Rfc822 = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME

  /** Best-effort timestamp parse: RFC-822 (RSS pubDate) and ISO-8601
    * (Atom updated/published); -1 when absent/unparseable (the
    * reference treats those entries as always-new).
    */
  def parseDateMs(s: String): Long = {
    val t = s.trim
    if (t.isEmpty) return -1L
    try java.time.ZonedDateTime.parse(t, Rfc822).toInstant.toEpochMilli
    catch {
      case _: Exception =>
        try java.time.OffsetDateTime.parse(t).toInstant.toEpochMilli
        catch {
          case _: Exception =>
            try java.time.LocalDateTime.parse(t)
              .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
            catch { case _: Exception => -1L }
        }
    }
  }

  private def textOf(e: HtmlDom.Elem, name: String): String =
    e.findFirst(Set(name)).map(el =>
      Entities.decode(el.textNodes.map(_.value).mkString("").trim)).getOrElse("")

  /** Parse one feed document (RSS 2.0 or Atom). Pure; malformed input
    * yields the entries that do parse, never a throw.
    */
  def parseFeed(xml: String, feedUrl: String): Seq[FeedEntry] = {
    val doc = HtmlDom.parse(xml, xmlMode = true)
    val items = doc.findAll(Set("item", "entry"))
    items.flatMap { item =>
      val title = textOf(item, "title")
      // RSS: <link>url</link>; Atom: <link href="url"/>
      val rawLink = {
        val linkElem = item.findFirst(Set("link"))
        val href = linkElem.flatMap(_.attr("href")).getOrElse("")
        if (href.nonEmpty) href
        else linkElem.map(l => l.textNodes.map(_.value).mkString("").trim).getOrElse("")
      }
      val dateStr = Seq("pubdate", "published", "updated", "dc:date")
        .map(textOf(item, _)).find(_.nonEmpty).getOrElse("")
      if (rawLink.isEmpty) None
      else UrlNormalizer.canonicalize(rawLink, site = Some(feedUrl)).map { u =>
        FeedEntry(feedUrl, u, title, parseDateMs(dateStr))
      }
    }
  }

  /** Explode a DataFrame of feed documents (feed_url, xml) into
    * entries; in-batch URL dedup included (reference D4,
    * rssconnector.py:47).
    */
  def entries(spark: SparkSession, feeds: DataFrame): Dataset[FeedEntry] = {
    import spark.implicits._
    feeds.select(col("feed_url"), col("xml"))
      .as[(String, String)]
      .flatMap { case (feedUrl, xml) => parseFeed(xml, feedUrl) }
      .dropDuplicates("url")
      .as[FeedEntry]
  }

  /** Timestamp-watermark incremental filter (D3): keep entries newer
    * than the stored per-feed max; return the filtered entries plus
    * the new per-feed watermark state to persist.
    * `state`: (feedUrl, maxPublishedMs).
    */
  def newSinceWatermark(spark: SparkSession, entries: Dataset[FeedEntry],
                        state: DataFrame): (Dataset[FeedEntry], DataFrame) = {
    import spark.implicits._
    val fresh = entries.toDF()
      .join(state.select(col("feedUrl"), col("maxPublishedMs")), Seq("feedUrl"), "left")
      .filter(col("maxPublishedMs").isNull ||
        col("publishedMs") < 0 || // undated entries always pass (reference behavior)
        col("publishedMs") > col("maxPublishedMs"))
      .drop("maxPublishedMs")
      .as[FeedEntry]
    val newState = entries.toDF()
      .groupBy("feedUrl")
      .agg(max(col("publishedMs")).as("newMax"))
      .join(state.select(col("feedUrl"), col("maxPublishedMs")), Seq("feedUrl"), "outer")
      .select(col("feedUrl"),
        greatest(coalesce(col("newMax"), lit(-1L)),
          coalesce(col("maxPublishedMs"), lit(-1L))).as("maxPublishedMs"))
    (fresh, newState)
  }
}
