package graft.core

import java.util.regex.Pattern
import scala.collection.mutable.ListBuffer

/** Deterministic boilerplate removal: html bytes → main text.
  *
  * Re-expresses the reference's `removeJunkData` + `stripHtml`
  * algorithm (reference: crawler/utils/utils.py:283-455 and :100-139)
  * — link-density / sentence-length pruning of block elements,
  * innermost-first, with the exact thresholds and integer-division
  * semantics — on top of [[HtmlDom]] instead of BeautifulSoup-3.
  *
  * This implementation IS the rebuild's reference for extracted text:
  * output must be byte-identical per url across runs, partitioning and
  * resume (SURVEY.md §7.4#1), which it guarantees by being a pure
  * function of the input bytes (no clocks, no locale, no randomness).
  *
  * Documented deviations from the reference (all pinned by tests):
  *  - if `<html` is absent the whole page is kept (the reference
  *    degenerates to the last byte via `s[s.find('<html'):]` with
  *    find = -1, utils.py:292 — a bug, not a behavior worth keeping);
  *  - the `<html` search and tag regexes are case-insensitive (real
  *    pages mix case; BS3 lowercased on re-serialization anyway);
  *  - multi-line XML comments are removed (the reference's first
  *    comment pass misses them but its soup pass then removes them,
  *    utils.py:290,321-322 — net behavior identical).
  */
object BoilerplateExtractor {

  /** Tags discarded wholesale (reference: utils.py:307). */
  val NodesToThrowAway: Set[String] = Set(
    "script", "noscript", "object", "embed", "input", "form", "style",
    "option", "img", "label", "applet")

  /** Block tags subject to link-density pruning (utils.py:309). */
  val NodesToPurge: Set[String] = Set("div", "table", "ul", "ol", "dl", "p")

  private val XmlComment = Pattern.compile("<!--.*?-->", Pattern.DOTALL)
  private val ScriptBlock = Pattern.compile("<script.*?</script[^>]*>",
    Pattern.DOTALL | Pattern.CASE_INSENSITIVE)
  private val PBrTag = Pattern.compile("</?(p|br)\\s?/?>")
  private val AnyTag = Pattern.compile("<[^<>]+>")
  private val LeadingWs = Pattern.compile("^(\\s)+")
  private val BlankLines = Pattern.compile("^(\\s*\\n)+", Pattern.MULTILINE)
  private val NullChars = Pattern.compile("\\x00")
  private val Whitespace = Pattern.compile("\\s+")

  def extractText(html: Array[Byte]): String =
    extractText(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  /** Full pipeline: prune the DOM, serialize with entity decode, strip
    * tags. Mirrors removeJunkData(rawpage, is_rawpage=True).
    */
  def extractText(rawPage: String): String = {
    val doc = prunedDom(rawPage)
    // Serialize with entities decoded in text (the BeautifulStoneSoup
    // ALL_ENTITIES pass, utils.py:453), then strip tags.
    stripHtml(HtmlDom.renderToString(doc, decodeEntities = true))
  }

  /** Title + outlinks + extracted text of one page. */
  final case class Extracted(title: Option[String], text: String,
                             links: Seq[String])

  /** FUSED single-parse extraction — the wave hot path (round-3
    * verdict #4): the string passes run once, the cleaned page is
    * parsed ONCE, and title + outlinks are read from that parse
    * before the pruning mutates it, so per-page cost drops from two
    * full parses to one (extract is the crawl loop's dominant
    * CPU-per-byte term; see BENCH.md's fused-extractor probe).
    *
    * `text` is byte-identical to [[extractText]] BY CONSTRUCTION
    * (same cleaned string, same parse, same pruning). Title and links
    * differ from the strict raw-parse path ONLY on markup the
    * reference's own string passes discard before its soup would have
    * seen it natively:
    *  - anchors/titles in text BEFORE the `<html` tag (the strict path
    *    reads them off the raw parse; the reference soup of the raw
    *    page would too — divergence pinned in BoilerplateExtractorSpec);
    *  - anchors inside `<!-- -->` comments whose removal changes
    *    script extents (pathological; pinned likewise).
    * The title fallback regex still scans the RAW page, so a page
    * whose only `<title>` predates `<html` keeps its title. Engines
    * needing strict raw-parse title/link semantics set
    * `CrawlConfig.strictExtract` (golden replay passes under BOTH).
    */
  def extractAll(rawPage: String, pageUrl: String): Extracted = {
    val doc = HtmlDom.parse(cleanedPage(rawPage))
    val title = titleFromDoc(doc, rawPage)
    val links = LinkExtractor.linkUrls(doc, pageUrl)
    pruneParsed(doc)
    Extracted(title,
      stripHtml(HtmlDom.renderToString(doc, decodeEntities = true)), links)
  }

  /** The reference's string-level passes BEFORE parsing (utils.py:
    * 290-292 comment strip, :292 `<html` find, script strip): these
    * run on the raw string in this exact order — comment removal can
    * legally alter script extents and the `<html` search scans script
    * bodies, so they are NOT expressible as DOM transforms.
    */
  def cleanedPage(rawPage: String): String = {
    var page = XmlComment.matcher(rawPage).replaceAll("")
    // case-insensitive scan without lowercasing (copying) the page
    val htmlIdx = HtmlDom.indexOfIgnoreCase(page, "<html", 0)
    if (htmlIdx > 0) page = page.substring(htmlIdx)
    ScriptBlock.matcher(page).replaceAll("")
  }

  /** Parse + apply all DOM-level pruning; returns the pruned document. */
  def prunedDom(rawPage: String): HtmlDom.Elem =
    pruneParsed(HtmlDom.parse(cleanedPage(rawPage)))

  /** All DOM-level pruning applied to an already-parsed CLEANED page
    * (mutates and returns `doc`).
    */
  def pruneParsed(doc: HtmlDom.Elem): HtmlDom.Elem = {
    // throw away <head> (utils.py:313-314)
    doc.findFirst(Set("head")).foreach(_.extract())
    // throw away junk tags (utils.py:324-325)
    doc.findAll(NodesToThrowAway).foreach(_.extract())
    // remove htmls embedded inside body (utils.py:327-329)
    doc.findFirst(Set("body")).foreach { body =>
      body.findAll(Set("html")).foreach(_.extract())
    }
    // drop whitespace-only text nodes (utils.py:331-335)
    doc.textNodes.foreach(t => if (t.value.trim.isEmpty) t.extract())

    purgeBlocks(doc)
    doc
  }

  /** The innermost-first link-density purge (utils.py:337-451).
    *
    * The reference repeatedly takes the first flagged block and
    * descends to its innermost flagged descendant — that visit order
    * is exactly post-order over the flagged blocks (children strictly
    * before parents, leftmost subtree first), so we collect post-order
    * once and make a single pass. Identical decisions, O(n·depth)
    * instead of the reference's restart-from-root O(n³) (which an
    * adversarial deeply-nested page turns into a hang).
    *
    * A block extracted here takes its flagged descendants with it —
    * but post-order guarantees those were already visited, so the
    * pass stays faithful to the reference's "removed nodes are never
    * revisited" behavior.
    */
  private def purgeBlocks(doc: HtmlDom.Elem): Unit = {
    // post-order collect of purgeable blocks, iterative
    val order = ListBuffer.empty[HtmlDom.Elem]
    val stack = new java.util.ArrayDeque[(HtmlDom.Elem, Boolean)]()
    stack.push((doc, false))
    while (!stack.isEmpty) {
      val (e, childrenDone) = stack.pop()
      if (childrenDone) {
        if (NodesToPurge.contains(e.name)) order += e
      } else {
        stack.push((e, true))
        var i = e.children.length - 1
        while (i >= 0) {
          e.children(i) match {
            case c: HtmlDom.Elem => stack.push((c, false))
            case _ =>
          }
          i -= 1
        }
      }
    }

    order.foreach { current =>
      // skip blocks already removed as part of an extracted subtree
      var p: HtmlDom.Elem = current
      while (p.parent != null) p = p.parent
      if (p eq doc) evaluateBlock(current)
    }
  }

  /** Apply the keep/delete decision to one block (utils.py:350-449). */
  private def evaluateBlock(current: HtmlDom.Elem): Unit = {
    {
      val texts = current.textNodes.map(_.value)
      if (texts.isEmpty) current.extract()
      else {
        val links = current.findAll(Set("a")).filter(_.attrs.contains("href"))
        val linkContents = links.map(_.renderContents()).filter(_.nonEmpty)
        val joinedLinks = linkContents.mkString("")
        var linkTextLength = joinedLinks.length
        val linkWords = splitWords(joinedLinks).length

        val joinedText = texts.mkString("")
        var textCount = texts.length - links.length
        val textLength = joinedText.length - linkTextLength
        val textWords = splitWords(joinedText).length - linkWords

        if (linkTextLength == 0) linkTextLength = 1
        if (textCount == 0) textCount = 1

        if (textWords == 0) current.extract() // no text data
        else if (Math.floorDiv(textLength + linkTextLength, linkTextLength) < 3)
          current.extract() // too link-dense
        else if (Math.floorDiv(textWords, textCount) < 5)
          current.extract() // too-short sentences
        else current.flagged = false // keep
      }
    }
  }

  private def splitWords(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty else Whitespace.split(t)
  }

  /** Tag-stripping text finisher (reference: stripHtml, utils.py:100-139).
    * `<p>`/`<br>` → newline, any other tag → space, leading whitespace
    * dropped, blank-line runs collapsed, `&nbsp;`/`&raquo;` fixed,
    * entity-decode second pass, trim.
    */
  def stripHtml(textIn: String): String = {
    var text = NullChars.matcher(textIn).replaceAll("")
    text = PBrTag.matcher(text).replaceAll("\n")
    text = AnyTag.matcher(text).replaceAll(" ")
    text = LeadingWs.matcher(text).replaceFirst("")
    text = BlankLines.matcher(text).replaceAll("\n")
    // two hardcoded junk-string removals kept for fidelity (utils.py:120-121)
    text = text.replace("');\" onMouseOut=\"setTimeout('hideLayer()',500);\" class=hotlink2>", "")
    text = text.replace("Click for the lowest price on dmnobieblank", "")
    text = text.replace("&nbsp;", " ")
    text = text.replace("&raquo;", "")
    text = Entities.decode(text)
    text.trim
  }

  /** Page title (reference: crawler/connectors/htmlconnector.py:116-125):
    * first text of the first `<title>`, entity-decoded; regex fallback;
    * None if absent.
    */
  def extractTitle(rawPage: String): Option[String] =
    titleFromDoc(HtmlDom.parse(rawPage), rawPage)

  private val TitleFallback =
    Pattern.compile("<title>(.*?)</title>", Pattern.CASE_INSENSITIVE)

  /** Title from an already-parsed RAW document (the wave hot path
    * parses each page once and shares the DOM between title and link
    * extraction — identical output to [[extractTitle]]).
    */
  def titleFromDoc(doc: HtmlDom.Elem, rawPage: String): Option[String] =
    doc.findFirst(Set("title")).flatMap(_.textNodes.headOption) match {
      case Some(t) => Some(Entities.decode(t.value))
      case None =>
        val m = TitleFallback.matcher(rawPage)
        if (m.find()) Some(Entities.decode(m.group(1))) else None
    }
}
