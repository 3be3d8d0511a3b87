package graft.core

/** Outlink extraction: html → candidate frontier URLs.
  *
  * Re-expresses the reference's `_addLinksToCrawler` + `getTitleFromLink`
  * (reference: crawler/connectors/htmlconnector.py:182-231): every
  * `<a href>` is normalized against the current page URL and the page's
  * `<base href>` (if any); the anchor's stripped inner HTML becomes the
  * link title; `javascript:` resolves to the site; self-links are the
  * caller's concern (frontier dedup drops them).
  *
  * In the Spark pipeline this runs as a `flatMap` over the typed page
  * Dataset — the UDTF-analog generator feeding frontier expansion.
  */
object LinkExtractor {

  final case class Link(url: String, title: Option[String])

  /** All outlinks of a page, document order, canonicalized
    * (normalization + tracking-param strip). Bad hrefs are skipped,
    * never fatal — one broken anchor must not kill a 100 TB stage.
    */
  def extractLinks(rawPage: String, pageUrl: String): Seq[Link] = {
    val doc = HtmlDom.parse(rawPage)
    extractLinks(doc, pageUrl)
  }

  /** One walk collecting the first `<base href>` (the one that applies
    * to every anchor, wherever it sits) and all anchors in document
    * order — extractLinks/linkUrls previously walked the tree twice
    * and built intermediate Lists per call.
    */
  private def baseAndAnchors(doc: HtmlDom.Elem)
      : (Option[String], Seq[HtmlDom.Elem]) = {
    var base: Option[String] = None
    var baseSeen = false
    val anchors = scala.collection.mutable.ArrayBuffer.empty[HtmlDom.Elem]
    doc.walkNodes {
      case e: HtmlDom.Elem =>
        if (e.name == "a") { anchors += e; () }
        else if (!baseSeen && e.name == "base") e.attr("href") match {
          case Some(h) => baseSeen = true; base = Some(h).filter(_.nonEmpty)
          case None =>
        }
      case _ =>
    }
    (base, anchors.toSeq)
  }

  def extractLinks(doc: HtmlDom.Elem, pageUrl: String): Seq[Link] = {
    val (base, anchors) = baseAndAnchors(doc)
    val ctx = new UrlNormalizer.ResolveContext(Some(pageUrl), base)
    anchors.flatMap { a =>
      a.attr("href") match {
        case Some(href) if href.nonEmpty =>
          try {
            UrlNormalizer.canonicalize(href.trim, ctx).map { url =>
              Link(url, titleOf(a))
            }
          } catch { case _: Exception => None }
        case _ => None
      }
    }
  }

  /** Outlink URLS ONLY from an already-parsed document — the wave hot
    * path: identical url set/order to [[extractLinks]] but skips the
    * per-anchor title rendering (two serialize+strip passes per anchor)
    * that the frontier never consumes.
    */
  def linkUrls(doc: HtmlDom.Elem, pageUrl: String): Seq[String] = {
    val (base, anchors) = baseAndAnchors(doc)
    val ctx = new UrlNormalizer.ResolveContext(Some(pageUrl), base)
    anchors.flatMap { a =>
      a.attr("href") match {
        case Some(href) if href.nonEmpty =>
          try UrlNormalizer.canonicalize(href.trim, ctx)
          catch { case _: Exception => None }
        case _ => None
      }
    }
  }

  /** Anchor title: stripped inner HTML, or None when the whole anchor
    * strips to nothing (htmlconnector.py:220-231).
    */
  def titleOf(anchor: HtmlDom.Elem): Option[String] = {
    val whole = BoilerplateExtractor.stripHtml(
      HtmlDom.renderToString(anchor, decodeEntities = false))
    if (whole.isEmpty) None
    else Some(Entities.decode(BoilerplateExtractor.stripHtml(anchor.renderContents())))
  }
}
