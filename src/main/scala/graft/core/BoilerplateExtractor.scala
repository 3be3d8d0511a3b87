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


  /** Java-regex `\s` (no UNICODE flag): exactly [ \t\n\x0B\f\r]. The
    * manual scans below must match the regex spec twins char for char,
    * so this must NOT be Character.isWhitespace (which differs on
    * U+001C-001F and unicode spaces).
    */
  @inline private def isRegexSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

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
    var page = removeXmlComments(rawPage)
    // case-insensitive scan without lowercasing (copying) the page
    val htmlIdx = HtmlDom.indexOfIgnoreCase(page, "<html", 0)
    if (htmlIdx > 0) page = page.substring(htmlIdx)
    removeScriptBlocks(page)
  }

  /** `<!--.*?-->` (DOTALL) → "" as a manual scan — byte-identical to
    * the regex (fuzz-pinned in BoilerplateExtractorSpec), no regex
    * engine, no copy when nothing matches. A `<!--` with no `-->` at
    * or after open+4 never matches, and then no later open can either.
    */
  private def removeXmlComments(s: String): String = {
    var open = s.indexOf("<!--")
    if (open < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var done = false
    while (!done && open >= 0) {
      val close = s.indexOf("-->", open + 4)
      if (close < 0) done = true
      else {
        sb.append(s, i, open)
        i = close + 3
        open = s.indexOf("<!--", i)
      }
    }
    if (i == 0) s
    else { sb.append(s, i, s.length); sb.toString }
  }

  /** ASCII-only case-insensitive find (needle must be lowercase): the
    * exact semantics of Pattern.CASE_INSENSITIVE without UNICODE_CASE,
    * which [[HtmlDom.indexOfIgnoreCase]]'s regionMatches does NOT have
    * (it unifies e.g. U+017F long-s with 's'; the regex twin doesn't).
    */
  private def indexOfAsciiIgnoreCase(h: String, needleLower: String,
                                     from: Int): Int = {
    val n = h.length
    val m = needleLower.length
    if (m == 0) return math.max(from, 0)
    // every caller's needle starts with caseless '<': jump between
    // candidates with intrinsic indexOf instead of probing each index
    val c0 = needleLower.charAt(0)
    val jump = c0 < 'a' || c0 > 'z'
    var i = math.max(from, 0)
    while (i <= n - m) {
      if (jump) {
        i = h.indexOf(c0, i)
        if (i < 0 || i > n - m) return -1
      }
      var j = if (jump) 1 else 0
      var ok = true
      while (ok && j < m) {
        val c = h.charAt(i + j)
        val l = needleLower.charAt(j)
        if (c != l && !(c >= 'A' && c <= 'Z' && (c + 32) == l)) ok = false
        j += 1
      }
      if (ok) return i
      i += 1
    }
    -1
  }

  /** `<script.*?</script[^>]*>` (DOTALL, CASE_INSENSITIVE) → "" as a
    * manual scan. Reluctant `.*?` = first `</script` after the open
    * that completes with a `>`; if the first candidate has no `>`
    * after it, no later candidate can, and no later `<script` can
    * match either — so the scan is linear.
    */
  private def removeScriptBlocks(s: String): String = {
    var open = indexOfAsciiIgnoreCase(s, "<script", 0)
    if (open < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var done = false
    while (!done && open >= 0) {
      val e = indexOfAsciiIgnoreCase(s, "</script", open + 7)
      val g = if (e < 0) -1 else s.indexOf('>', e + 8)
      if (g < 0) done = true
      else {
        sb.append(s, i, open)
        i = g + 1
        open = indexOfAsciiIgnoreCase(s, "<script", i)
      }
    }
    if (i == 0) s
    else { sb.append(s, i, s.length); sb.toString }
  }

  /** Parse + apply all DOM-level pruning; returns the pruned document. */
  def prunedDom(rawPage: String): HtmlDom.Elem =
    pruneParsed(HtmlDom.parse(cleanedPage(rawPage)))

  /** Marks where the first `<body>`'s subtree ends on the fused-walk
    * stack (popped after all of body's descendants).
    */
  private object BodyEnd

  /** All DOM-level pruning applied to an already-parsed CLEANED page
    * (mutates and returns `doc`).
    *
    * The reference runs four sequential tree passes — junk-tag removal
    * (utils.py:324-325), embedded-html removal under the first `<body>`
    * (utils.py:327-329), whitespace-only text-node removal
    * (utils.py:331-335) — then collects the purgeable blocks. Here all
    * of that is ONE pre-order walk (this runs per page in the wave hot
    * path; the sequential passes were 4 full walks plus intermediate
    * Lists). End state is identical to the sequential passes because
    * every removal takes a whole subtree, ancestors are visited before
    * descendants, and each pass's membership test (tag name / text
    * whitespace) is independent of the other passes' edits — so
    * "extract on first visit and skip the subtree" removes exactly the
    * union the sequential passes removed. The lone cross-pass
    * dependency — which `<body>` is first — is preserved: the walk's
    * first NON-REMOVED body is the body `findFirst` saw after the junk
    * pass. `<head>` removal stays a separate early-exit pass so a
    * doc-order-first head nested in a junk tag is still the one
    * consumed (pinned in BoilerplateExtractorSpec).
    */
  def pruneParsed(doc: HtmlDom.Elem): HtmlDom.Elem = {
    // throw away <head> (utils.py:313-314)
    doc.findFirst(Set("head")).foreach(_.extract())

    // purgeable blocks in pre-order; evaluated in reverse below
    val blocks = new scala.collection.mutable.ArrayBuffer[HtmlDom.Elem]
    val stack = new java.util.ArrayDeque[AnyRef]()
    var inBody = false
    var bodySeen = false
    var i = doc.children.length - 1
    while (i >= 0) { stack.push(doc.children(i)); i -= 1 }
    while (!stack.isEmpty) {
      stack.pop() match {
        case BodyEnd => inBody = false
        case t: HtmlDom.Text =>
          // whitespace-only text nodes: `trim.isEmpty` ⇔ every char
          // <= 0x20 (String.trim strips exactly chars <= U+0020) —
          // checked without allocating the trimmed copy; text nodes
          // are leaves so extraction is safe mid-walk.
          val s = t.value
          var j = 0
          while (j < s.length && s.charAt(j) <= ' ') j += 1
          if (j == s.length) t.extract()
        case e: HtmlDom.Elem =>
          val name = e.name
          if (NodesToThrowAway.contains(name) || (inBody && name == "html")) {
            e.extract() // whole subtree gone; nothing beneath is visited
          } else {
            if (NodesToPurge.contains(name)) blocks += e
            if (!bodySeen && name == "body") {
              bodySeen = true; inBody = true
              stack.push(BodyEnd)
            }
            var j = e.children.length - 1
            while (j >= 0) { stack.push(e.children(j)); j -= 1 }
          }
        case _ => // comments: kept here, dropped at serialization
      }
    }

    // The innermost-first link-density purge (utils.py:337-451).
    //
    // The reference repeatedly takes the first flagged block and
    // descends to its innermost flagged descendant — children strictly
    // before parents. Reverse pre-order visits every block after all
    // its descendants too, and keep/delete decisions of disjoint
    // subtrees are independent (blockStats reads only the block's own
    // subtree), so the end tree is identical — O(n·depth) instead of
    // the reference's restart-from-root O(n³) (which an adversarial
    // deeply-nested page turns into a hang).
    var k = blocks.length - 1
    while (k >= 0) {
      val current = blocks(k)
      // skip blocks already removed as part of an extracted subtree
      var p: HtmlDom.Elem = current
      while (p.parent != null) p = p.parent
      if (p eq doc) evaluateBlock(current)
      k -= 1
    }
    doc
  }

  /** Streaming length + word counter over a concatenation of strings,
    * byte-equivalent to `Whitespace.split(concat.trim).length` (the
    * original `splitWords(texts.mkString(""))` recipe) without ever
    * building the concatenation. `String.trim` strips chars <= 0x20 —
    * a superset of regex `\s` — so a token is a maximal non-`\s` run
    * that is not entirely confined to the trimmed-off edges: runs made
    * only of "weak" chars (<= 0x20 but not `\s`, i.e. the C0 controls
    * outside \t\n\x0B\f\r) count only when a "strong" char (> 0x20)
    * occurs both before and after them. Fuzz-pinned against the
    * splitWords twin in BoilerplateExtractorSpec.
    */
  private[graft] final class WordScan extends HtmlDom.CharSink {
    var length = 0
    var words = 0
    private var inWord = false
    private var curCounted = false
    private var seenStrong = false
    private var pendingWeak = 0

    def put(c: Char): Unit = {
      length += 1
      if (isRegexSpace(c)) {
        if (inWord) { inWord = false; if (!curCounted) pendingWeak += 1 }
      } else {
        if (!inWord) { inWord = true; curCounted = false }
        if (c > ' ') {
          if (!seenStrong) { seenStrong = true; pendingWeak = 0 }
          if (!curCounted) { words += pendingWeak + 1; pendingWeak = 0; curCounted = true }
        }
      }
    }

    def put(s: String): Unit = {
      var i = 0
      while (i < s.length) { put(s.charAt(i)); i += 1 }
    }
  }

  /** The six per-block numbers the keep/delete decision reads, via
    * streaming scans (no joined strings, no renderContents strings,
    * no split arrays). `textLen`/`textWords` are of the text-node
    * concatenation; `linkLen`/`linkWords` of the concatenated link
    * renderContents — one scan across all links replicates the
    * original `mkString("")` word-run merging at link boundaries
    * (and the `.filter(_.nonEmpty)` is a concatenation no-op).
    */
  private[graft] final case class BlockStats(
      texts: Int, links: Int, textLen: Int, textWords: Int,
      linkLen: Int, linkWords: Int)

  private[graft] def blockStats(current: HtmlDom.Elem): BlockStats = {
    var texts = 0
    var links = 0
    val textScan = new WordScan
    val linkScan = new WordScan
    // ONE pre-order walk (walkNodes = document order): text nodes feed
    // textScan in textNodes order; each href-anchor renders its
    // contents into linkScan at the point the walk finds it — exactly
    // findAll order — and a nested anchor renders again when the walk
    // reaches it, preserving the original per-anchor renderContents
    // double-count.
    current.walkNodes {
      case t: HtmlDom.Text =>
        texts += 1
        textScan.put(t.value)
      case e: HtmlDom.Elem if e.name == "a" && e.attrs.contains("href") =>
        links += 1
        e.children.foreach(n => HtmlDom.render(n, linkScan, decodeEntities = false))
      case _ =>
    }
    BlockStats(texts, links, textScan.length, textScan.words,
      linkScan.length, linkScan.words)
  }

  /** Apply the keep/delete decision to one block (utils.py:350-449). */
  private def evaluateBlock(current: HtmlDom.Elem): Unit = {
    val s = blockStats(current)
    if (s.texts == 0) current.extract()
    else {
      var linkTextLength = s.linkLen
      var textCount = s.texts - s.links
      val textLength = s.textLen - linkTextLength
      val textWords = s.textWords - s.linkWords

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

  /** Tag-stripping text finisher (reference: stripHtml, utils.py:100-139).
    * `<p>`/`<br>` → newline, any other tag → space, leading whitespace
    * dropped, blank-line runs collapsed, `&nbsp;`/`&raquo;` fixed,
    * entity-decode second pass, trim.
    *
    * The four page-sized regex passes (`\x00`, `</?(p|br)\s?/?>`,
    * `<[^<>]+>`, `(?m)^(\s*\n)+`) are manual linear scans — the regex
    * originals live on as spec twins in BoilerplateExtractorSpec and a
    * seeded fuzz suite pins byte-identity. Rationale: this runs once
    * per page in the wave hot path, and the regex engine's per-match
    * allocation was a measurable slice of extract CPU (MicroBench
    * --phases).
    */
  def stripHtml(textIn: String): String = {
    var text = removeNulls(textIn)
    text = replacePBrTags(text)
    text = replaceAnyTags(text)
    text = dropLeadingRegexSpace(text)
    text = collapseBlankLines(text)
    // two hardcoded junk-string removals kept for fidelity (utils.py:120-121)
    text = text.replace("');\" onMouseOut=\"setTimeout('hideLayer()',500);\" class=hotlink2>", "")
    text = text.replace("Click for the lowest price on dmnobieblank", "")
    text = text.replace("&nbsp;", " ")
    text = text.replace("&raquo;", "")
    text = Entities.decode(text)
    text.trim
  }

  /** `\x00` → "" (no copy when absent). */
  private def removeNulls(s: String): String = {
    if (s.indexOf('\u0000') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\u0000') sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Match end (exclusive) of `</?(p|br)\s?/?>` anchored at `lt`, or
    * -1 — suffix alternatives tried in the regex's greedy backtrack
    * order (`\s/>`, `\s>`, `/>`, `>`). The `(p|br)` alternation needs
    * no backtracking: the branches differ in their first char.
    */
  private def matchPBr(s: String, lt: Int): Int = {
    val n = s.length
    var j = lt + 1
    if (j < n && s.charAt(j) == '/') j += 1
    if (j < n && s.charAt(j) == 'p') j += 1
    else if (j + 1 < n && s.charAt(j) == 'b' && s.charAt(j + 1) == 'r') j += 2
    else return -1
    if (j < n && isRegexSpace(s.charAt(j))) {
      if (j + 2 < n && s.charAt(j + 1) == '/' && s.charAt(j + 2) == '>') return j + 3
      if (j + 1 < n && s.charAt(j + 1) == '>') return j + 2
    }
    if (j + 1 < n && s.charAt(j) == '/' && s.charAt(j + 1) == '>') return j + 2
    if (j < n && s.charAt(j) == '>') return j + 1
    -1
  }

  /** `</?(p|br)\s?/?>` → "\n". */
  private def replacePBrTags(s: String): String = {
    var lt = s.indexOf('<')
    if (lt < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (lt >= 0) {
      val end = matchPBr(s, lt)
      if (end > 0) { sb.append(s, i, lt).append('\n'); i = end }
      lt = s.indexOf('<', if (end > 0) end else lt + 1)
    }
    if (i == 0) s
    else { sb.append(s, i, s.length); sb.toString }
  }

  /** `<[^<>]+>` → " ". On a failed attempt the next possible match
    * start is the next '<', so the scan is linear.
    */
  private def replaceAnyTags(s: String): String = {
    val n = s.length
    var lt = s.indexOf('<')
    if (lt < 0) return s
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var changed = false
    while (lt >= 0) {
      var j = lt + 1
      while (j < n && s.charAt(j) != '<' && s.charAt(j) != '>') j += 1
      if (j < n && s.charAt(j) == '>' && j > lt + 1) {
        sb.append(s, i, lt).append(' ')
        i = j + 1
        changed = true
        lt = s.indexOf('<', i)
      } else {
        lt = s.indexOf('<', lt + 1)
      }
    }
    if (!changed) s
    else { sb.append(s, i, n); sb.toString }
  }

  /** `^(\s)+` replaceFirst "". */
  private def dropLeadingRegexSpace(s: String): String = {
    var i = 0
    while (i < s.length && isRegexSpace(s.charAt(i))) i += 1
    if (i == 0) s else s.substring(i)
  }

  /** `(?m)^(\s*\n)+` → "\n". At a line start the greedy match is the
    * maximal run of `\s` chars truncated at its LAST newline (one
    * `\s*\n` iteration suffices — `\s` includes `\n`); MULTILINE `^`
    * also matches after CR, NEL (U+0085), LS (U+2028), PS (U+2029) (after the
    * `\n` of a `\r\n` pair, not between).
    */
  private def collapseBlankLines(s: String): String = {
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var i = 0
    var p = 0
    while (p < n) {
      // p is a ^ position
      var r = p
      var lastNl = -1
      while (r < n && isRegexSpace(s.charAt(r))) {
        if (s.charAt(r) == '\n') lastNl = r
        r += 1
      }
      if (lastNl >= 0) {
        if (sb == null) sb = new java.lang.StringBuilder(n)
        sb.append(s, i, p).append('\n')
        i = lastNl + 1
        p = lastNl + 1
      } else {
        // no match here; advance to the next line start
        var q = p
        var next = n
        var found = false
        while (!found && q < n) {
          val c = s.charAt(q)
          if (c == '\n' || c == '\u0085' || c == '\u2028' || c == '\u2029') {
            next = q + 1; found = true
          } else if (c == '\r') {
            next = if (q + 1 < n && s.charAt(q + 1) == '\n') q + 2 else q + 1
            found = true
          } else q += 1
        }
        p = next
      }
    }
    if (sb == null) s
    else { sb.append(s, i, n); sb.toString }
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
    doc.findFirst(Set("title")).flatMap(_.firstTextNode) match {
      case Some(t) => Some(Entities.decode(t.value))
      case None =>
        val m = TitleFallback.matcher(rawPage)
        if (m.find()) Some(Entities.decode(m.group(1))) else None
    }
}
