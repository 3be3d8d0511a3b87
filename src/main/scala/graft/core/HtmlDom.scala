package graft.core

import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** A small, forgiving, dependency-free HTML parser producing a mutable
  * DOM with the operations the boilerplate extractor needs: descendant
  * search, node removal, and (entity-decoding) serialization.
  *
  * This plays the role BeautifulSoup-3 plays in the reference
  * (reference: crawler/utils/utils.py:294,317). Parse behavior is
  * defined by THIS implementation and pinned by golden tests — the
  * rebuild's per-url byte-identity contract is against this parser
  * (see SURVEY.md §7.4#1), not against BS3's quirks.
  *
  * Design notes for scale: parsing happens inside row transforms on
  * executors; the parser is single-pass, allocation-light, and never
  * touches shared state, so it is safe under whole-partition
  * parallelism and cheap enough for ~100 TB of pages.
  */
object HtmlDom {

  sealed trait Node {
    var parent: Elem = _
    /** Detach this node from its parent (BS3 `extract()`). */
    def extract(): Unit = if (parent != null) { parent.children -= this; parent = null }
  }

  final class Text(val value: String) extends Node
  final class Comment(val value: String) extends Node

  final class Elem(val name: String, val attrs: Map[String, String]) extends Node {
    val children: ArrayBuffer[Node] = ArrayBuffer.empty
    var flagged: Boolean = false // purge-loop working flag

    def append(n: Node): Unit = { n.parent = this; children += n }

    def attr(key: String): Option[String] = attrs.get(key)

    /** All descendant nodes (document order, self excluded).
      * Iterative with an explicit stack — real pages nest arbitrarily
      * deep and a recursive walk would overflow an executor thread's
      * stack (found by an adversarial 5000-deep probe).
      */
    private[core] def walkNodes(f: Node => Unit): Unit = {
      val stack = new java.util.ArrayDeque[Node]()
      var i = children.length - 1
      while (i >= 0) { stack.push(children(i)); i -= 1 }
      while (!stack.isEmpty) {
        val n = stack.pop()
        f(n)
        n match {
          case e: Elem =>
            var j = e.children.length - 1
            while (j >= 0) { stack.push(e.children(j)); j -= 1 }
          case _ =>
        }
      }
    }

    /** All descendant elements (document order, self excluded). */
    def descendants: List[Elem] = {
      val out = ListBuffer.empty[Elem]
      walkNodes { case e: Elem => out += e; case _ => }
      out.toList
    }

    def findAll(names: Set[String]): List[Elem] = {
      val out = ListBuffer.empty[Elem]
      walkNodes { case e: Elem if names.contains(e.name) => out += e; case _ => }
      out.toList
    }

    /** First matching descendant, document order — early-exit walk
      * (findAll visits the whole tree to take one element; this runs
      * per page in the wave hot path for head/body/title lookups).
      */
    def findFirst(names: Set[String]): Option[Elem] = {
      val stack = new java.util.ArrayDeque[Node]()
      var i = children.length - 1
      while (i >= 0) { stack.push(children(i)); i -= 1 }
      while (!stack.isEmpty) {
        stack.pop() match {
          case e: Elem =>
            if (names.contains(e.name)) return Some(e)
            var j = e.children.length - 1
            while (j >= 0) { stack.push(e.children(j)); j -= 1 }
          case _ =>
        }
      }
      None
    }

    /** First descendant text node, document order — early-exit. */
    def firstTextNode: Option[Text] = {
      val stack = new java.util.ArrayDeque[Node]()
      var i = children.length - 1
      while (i >= 0) { stack.push(children(i)); i -= 1 }
      while (!stack.isEmpty) {
        stack.pop() match {
          case t: Text => return Some(t)
          case e: Elem =>
            var j = e.children.length - 1
            while (j >= 0) { stack.push(e.children(j)); j -= 1 }
          case _ =>
        }
      }
      None
    }

    /** All descendant text nodes, document order. */
    def textNodes: List[Text] = {
      val out = ListBuffer.empty[Text]
      walkNodes { case t: Text => out += t; case _ => }
      out.toList
    }

    /** Serialize children only (BS3 `renderContents()`): tags
      * lowercase, attributes in source order, text verbatim (entities
      * NOT decoded — decoding happens once, at final text emission).
      */
    def renderContents(): String = {
      val sb = new StringBuilder
      children.foreach(n => render(n, sb, decodeEntities = false))
      sb.toString
    }
  }

  /** Elements that never have children in HTML. */
  val VoidElements: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  /** Opening one of these implicitly closes an open <p>. */
  private val ClosesP: Set[String] = Set(
    "p", "div", "table", "ul", "ol", "dl", "li", "dd", "dt",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "form",
    "address", "article", "aside", "fieldset", "footer", "header",
    "hr", "main", "nav", "section")

  /** Content of these is raw text until the matching close tag. */
  private val RawText: Set[String] = Set("script", "style", "textarea", "title")

  sealed trait Token
  private final case class TText(s: String) extends Token
  private final case class TComment(s: String) extends Token
  private final case class TOpen(name: String, attrs: Map[String, String], selfClose: Boolean) extends Token
  private final case class TClose(name: String) extends Token

  /** Receiver for the streaming tokenizer: [[parse]] builds the tree
    * directly off these callbacks, with no intermediate token list
    * (parse runs per page in the wave hot path; the list and the
    * per-tag Token objects were measurable allocation).
    */
  private trait TokenSink {
    def text(s: String): Unit
    def comment(s: String): Unit
    def open(name: String, attrs: Map[String, String], selfClose: Boolean): Unit
    def close(name: String): Unit
  }

  /** Tokenize; forgiving — anything unparseable is treated as text.
    * (List-producing wrapper over the streaming core, kept for tests
    * and non-hot callers.)
    */
  def tokenize(html: String, xmlMode: Boolean = false): List[Token] = {
    val out = ListBuffer.empty[Token]
    tokenizeTo(html, xmlMode, new TokenSink {
      def text(s: String): Unit = { out += TText(s); () }
      def comment(s: String): Unit = { out += TComment(s); () }
      def open(name: String, attrs: Map[String, String], selfClose: Boolean): Unit =
        { out += TOpen(name, attrs, selfClose); () }
      def close(name: String): Unit = { out += TClose(name); () }
    })
    out.toList
  }

  private def tokenizeTo(html: String, xmlMode: Boolean, sink: TokenSink): Unit = {
    val n = html.length
    val tag = new TagOut
    var i = 0
    var rawUntil: String = null // inside <script>/<style>: text until this close tag
    while (i < n) {
      if (rawUntil != null) {
        // case-insensitive scan for the close tag WITHOUT copying the
        // document: a page with hundreds of <script> tags must not
        // re-lowercase the whole html per tag (O(tags·n) allocations)
        val close = indexOfIgnoreCase(html, "</" + rawUntil, i)
        val stop = if (close < 0) n else close
        if (stop > i) sink.text(html.substring(i, stop))
        i = stop
        rawUntil = null
      } else {
        val lt = html.indexOf('<', i)
        if (lt < 0) { sink.text(html.substring(i)); i = n }
        else {
          if (lt > i) sink.text(html.substring(i, lt))
          if (lt + 1 >= n) { sink.text(html.substring(lt)); i = n }
          else html.charAt(lt + 1) match {
            case '!' =>
              if (html.startsWith("<!--", lt)) {
                val end = html.indexOf("-->", lt + 4)
                val stop = if (end < 0) n else end + 3
                sink.comment(html.substring(math.min(lt + 4, stop),
                  if (end < 0) n else end))
                i = stop
              } else { // doctype / CDATA / decl: drop
                val end = html.indexOf('>', lt + 2)
                i = if (end < 0) n else end + 1
              }
            case '?' => // processing instruction: drop
              val end = html.indexOf('>', lt + 2)
              i = if (end < 0) n else end + 1
            case '/' =>
              val end = html.indexOf('>', lt + 2)
              if (end < 0) { sink.text(html.substring(lt)); i = n }
              else {
                val name = html.substring(lt + 2, end).trim.toLowerCase
                  .takeWhile(c => !c.isWhitespace)
                if (name.nonEmpty && name.forall(isNameChar)) sink.close(name)
                i = end + 1
              }
            case c if c.isLetter =>
              if (parseTag(html, lt, tag)) {
                sink.open(tag.name, tag.attrs, tag.selfClose)
                if (!tag.selfClose && !xmlMode && RawText.contains(tag.name))
                  rawUntil = tag.name
                i = tag.next
              } else {
                sink.text(html.substring(lt, lt + 1)); i = lt + 1
              }
            case _ => sink.text(html.substring(lt, lt + 1)); i = lt + 1
          }
        }
      }
    }
  }

  private[graft] def indexOfIgnoreCase(haystack: String, needle: String, from: Int): Int = {
    val n = haystack.length
    val m = needle.length
    if (m == 0) return math.max(from, 0)
    val c0 = needle.charAt(0)
    // caseless first char (every caller's needle starts with '<'):
    // jump between candidate positions instead of probing every index
    val jump = !Character.isLetter(c0) && Character.toUpperCase(c0) == c0 &&
      Character.toLowerCase(c0) == c0
    var i = math.max(from, 0)
    while (i <= n - m) {
      if (jump) {
        i = haystack.indexOf(c0, i)
        if (i < 0 || i > n - m) return -1
      }
      if (haystack.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }

  private def isNameChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '-' || c == '_' || c == ':'

  /** Reusable out-params for [[parseTag]] (one per tokenize call —
    * avoids a tuple/Option allocation per tag).
    */
  private final class TagOut {
    var name: String = _
    var attrs: Map[String, String] = _
    var selfClose: Boolean = false
    var next: Int = 0
  }

  /** `substring(start, end).toLowerCase`, skipping both copies when
    * the region is pure lowercase-or-caseless ASCII (the common case
    * for tag/attr names). Non-ASCII falls back to the exact original
    * expression — String.toLowerCase semantics are pinned by goldens.
    */
  private def lowerSub(html: String, start: Int, end: Int): String = {
    var i = start
    var easy = true
    while (easy && i < end) {
      val c = html.charAt(i)
      if (c >= 'A' && c <= 'Z') easy = false
      else if (c >= 0x80) easy = false
      i += 1
    }
    if (easy) html.substring(start, end)
    else html.substring(start, end).toLowerCase
  }

  /** Parse one `<name attr=...>` tag anchored at `lt` into `out`;
    * false if no tag name follows the `<`.
    */
  private def parseTag(html: String, lt: Int, out: TagOut): Boolean = {
    val n = html.length
    var i = lt + 1
    val nameStart = i
    while (i < n && isNameChar(html.charAt(i))) i += 1
    if (i == nameStart) return false
    val name = lowerSub(html, nameStart, i)
    // Built directly as an immutable Map (Map1..Map4 for the common
    // ≤4-attr tag — insertion-ordered, allocation-light; ≥5 switches
    // to HashMap exactly as LinkedHashMap.toMap did, same iteration
    // order both ways). Attr-less tags (most of a page) allocate none.
    var attrs: Map[String, String] = null
    var selfClose = false
    var done = false
    while (!done && i < n) {
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else html.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && html.charAt(i + 1) == '>') { selfClose = true; i += 2; done = true }
          else i += 1
        case _ =>
          val aStart = i
          while (i < n && !html.charAt(i).isWhitespace &&
                 html.charAt(i) != '=' && html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
          val aName = lowerSub(html, aStart, i)
          while (i < n && html.charAt(i).isWhitespace) i += 1
          var value = ""
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && html.charAt(i).isWhitespace) i += 1
            if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
              val quote = html.charAt(i)
              val end = html.indexOf(quote, i + 1)
              if (end < 0) { value = html.substring(i + 1); i = n }
              else { value = html.substring(i + 1, end); i = end + 1 }
            } else {
              val vStart = i
              while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '>') i += 1
              value = html.substring(vStart, i)
            }
          }
          if (aName.nonEmpty) {
            if (attrs == null) attrs = Map(aName -> value)
            else if (!attrs.contains(aName)) attrs = attrs.updated(aName, value)
          }
      }
    }
    out.name = name
    out.attrs = if (attrs == null) Map.empty else attrs
    out.selfClose = selfClose
    out.next = i
    true
  }

  /** Build a DOM. The returned root is a synthetic `[document]` element.
    * `xmlMode=true` disables the HTML-isms (void elements, raw-text
    * elements, implicit closes) for RSS/Atom and other XML documents,
    * where `<link>foo</link>` is a regular container.
    */
  def parse(html: String, xmlMode: Boolean = false): Elem = {
    val root = new Elem("[document]", Map.empty)
    tokenizeTo(html, xmlMode, new TokenSink {
      private var cur = root
      def text(s: String): Unit = cur.append(new Text(s))
      def comment(s: String): Unit = cur.append(new Comment(s))
      def close(name: String): Unit = {
        // pop to the nearest matching open element, if any
        var e = cur
        while (e != root && e.name != name) e = e.parent
        if (e != root) cur = if (e.parent != null) e.parent else root
      }
      def open(name: String, attrs: Map[String, String], selfClose: Boolean): Unit = {
        if (!xmlMode && (name == "p" || ClosesP.contains(name))) {
          var e = cur
          while (e != root && e.name != "p") e = e.parent
          if (e != root && e.name == "p") cur = if (e.parent != null) e.parent else root
        }
        if (!xmlMode &&
            (name == "li" || name == "option" || name == "tr" || name == "td" || name == "th")) {
          var e = cur
          while (e != root && e.name != name) e = e.parent
          if (e != root && e.name == name) cur = if (e.parent != null) e.parent else root
        }
        val elem = new Elem(name, attrs)
        cur.append(elem)
        if (!selfClose && (xmlMode || !VoidElements.contains(name))) cur = elem
      }
    })
    root
  }

  /** Serialize a node. `decodeEntities=true` decodes entity references
    * in text nodes (the reference's BeautifulStoneSoup ALL_ENTITIES
    * pass, crawler/utils/utils.py:453) while keeping tag markup.
    * Iterative (explicit work stack) — deep nesting must not overflow
    * an executor thread's stack.
    */
  /** Minimal character receiver so serialization can feed either a
    * StringBuilder or a streaming counter (BoilerplateExtractor's
    * WordScan) without materializing the markup string.
    */
  trait CharSink {
    def put(s: String): Unit
    def put(c: Char): Unit
  }

  private final class SbSink(sb: StringBuilder) extends CharSink {
    def put(s: String): Unit = { sb.append(s); () }
    def put(c: Char): Unit = { sb.append(c); () }
  }

  def render(node: Node, sb: StringBuilder, decodeEntities: Boolean): Unit =
    render(node, new SbSink(sb), decodeEntities)

  def render(node: Node, sink: CharSink, decodeEntities: Boolean): Unit = {
    // Work stack holds Nodes to visit and (bare String) close-tag names
    // to emit — no per-node wrapper objects (render runs per page in
    // the wave hot path and per anchor in the purge-block stats scan).
    val stack = new java.util.ArrayDeque[AnyRef]()
    stack.push(node)
    while (!stack.isEmpty) {
      stack.pop() match {
        case name: String => sink.put("</"); sink.put(name); sink.put('>')
        case t: Text =>
          sink.put(if (decodeEntities) Entities.decode(t.value) else t.value)
        case _: Comment => // comments never serialize
        case e: Elem =>
          val isDoc = e.name == "[document]"
          if (!isDoc) {
            sink.put('<'); sink.put(e.name)
            e.attrs.foreach { case (k, v) =>
              sink.put(' '); sink.put(k); sink.put("=\""); sink.put(v); sink.put('"')
            }
            sink.put('>')
          }
          if (!isDoc && !VoidElements.contains(e.name)) stack.push(e.name)
          var i = e.children.length - 1
          while (i >= 0) { stack.push(e.children(i)); i -= 1 }
      }
    }
  }

  def renderToString(node: Node, decodeEntities: Boolean): String = {
    val sb = new StringBuilder
    render(node, sb, decodeEntities)
    sb.toString
  }
}
