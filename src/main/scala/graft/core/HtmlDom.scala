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

    def findFirst(names: Set[String]): Option[Elem] =
      findAll(names).headOption

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

  /** Tokenize; forgiving — anything unparseable is treated as text. */
  def tokenize(html: String, xmlMode: Boolean = false): List[Token] = {
    val out = ListBuffer.empty[Token]
    val n = html.length
    var i = 0
    var rawUntil: String = null // inside <script>/<style>: text until this close tag
    while (i < n) {
      if (rawUntil != null) {
        // case-insensitive scan for the close tag WITHOUT copying the
        // document: a page with hundreds of <script> tags must not
        // re-lowercase the whole html per tag (O(tags·n) allocations)
        val close = indexOfIgnoreCase(html, "</" + rawUntil, i)
        val stop = if (close < 0) n else close
        if (stop > i) out += TText(html.substring(i, stop))
        i = stop
        rawUntil = null
      } else {
        val lt = html.indexOf('<', i)
        if (lt < 0) { out += TText(html.substring(i)); i = n }
        else {
          if (lt > i) out += TText(html.substring(i, lt))
          if (lt + 1 >= n) { out += TText(html.substring(lt)); i = n }
          else html.charAt(lt + 1) match {
            case '!' =>
              if (html.startsWith("<!--", lt)) {
                val end = html.indexOf("-->", lt + 4)
                val stop = if (end < 0) n else end + 3
                out += TComment(html.substring(math.min(lt + 4, stop),
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
              if (end < 0) { out += TText(html.substring(lt)); i = n }
              else {
                val name = html.substring(lt + 2, end).trim.toLowerCase
                  .takeWhile(c => !c.isWhitespace)
                if (name.nonEmpty && name.forall(isNameChar)) out += TClose(name)
                i = end + 1
              }
            case c if c.isLetter =>
              parseTag(html, lt) match {
                case Some((tok, next)) =>
                  out += tok
                  tok match {
                    case TOpen(nm, _, false) if !xmlMode && RawText.contains(nm) =>
                      rawUntil = nm
                    case _ =>
                  }
                  i = next
                case None =>
                  out += TText(html.substring(lt, lt + 1)); i = lt + 1
              }
            case _ => out += TText(html.substring(lt, lt + 1)); i = lt + 1
          }
        }
      }
    }
    out.toList
  }

  private[graft] def indexOfIgnoreCase(haystack: String, needle: String, from: Int): Int = {
    val n = haystack.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i <= n - m) {
      if (haystack.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }

  private def isNameChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '-' || c == '_' || c == ':'

  private def parseTag(html: String, lt: Int): Option[(TOpen, Int)] = {
    val n = html.length
    var i = lt + 1
    val nameStart = i
    while (i < n && isNameChar(html.charAt(i))) i += 1
    if (i == nameStart) return None
    val name = html.substring(nameStart, i).toLowerCase
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
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
          val aName = html.substring(aStart, i).toLowerCase
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
          if (aName.nonEmpty && !attrs.contains(aName)) attrs(aName) = value
      }
    }
    Some((TOpen(name, attrs.toMap, selfClose), i))
  }

  /** Build a DOM. The returned root is a synthetic `[document]` element.
    * `xmlMode=true` disables the HTML-isms (void elements, raw-text
    * elements, implicit closes) for RSS/Atom and other XML documents,
    * where `<link>foo</link>` is a regular container.
    */
  def parse(html: String, xmlMode: Boolean = false): Elem = {
    val root = new Elem("[document]", Map.empty)
    var cur = root
    tokenize(html, xmlMode).foreach {
      case TText(s) => cur.append(new Text(s))
      case TComment(s) => cur.append(new Comment(s))
      case TClose(name) =>
        // pop to the nearest matching open element, if any
        var e = cur
        while (e != root && e.name != name) e = e.parent
        if (e != root) cur = if (e.parent != null) e.parent else root
      case TOpen(name, attrs, selfClose) =>
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
    sealed trait Work
    final case class Visit(n: Node) extends Work
    final case class CloseTag(name: String) extends Work
    val stack = new java.util.ArrayDeque[Work]()
    stack.push(Visit(node))
    while (!stack.isEmpty) {
      stack.pop() match {
        case CloseTag(name) => sink.put("</"); sink.put(name); sink.put('>')
        case Visit(t: Text) =>
          sink.put(if (decodeEntities) Entities.decode(t.value) else t.value)
        case Visit(_: Comment) => // comments never serialize
        case Visit(e: Elem) =>
          val isDoc = e.name == "[document]"
          if (!isDoc) {
            sink.put('<'); sink.put(e.name)
            e.attrs.foreach { case (k, v) =>
              sink.put(' '); sink.put(k); sink.put("=\""); sink.put(v); sink.put('"')
            }
            sink.put('>')
          }
          if (!isDoc && !VoidElements.contains(e.name)) stack.push(CloseTag(e.name))
          var i = e.children.length - 1
          while (i >= 0) { stack.push(Visit(e.children(i))); i -= 1 }
      }
    }
  }

  def renderToString(node: Node, decodeEntities: Boolean): String = {
    val sb = new StringBuilder
    render(node, sb, decodeEntities)
    sb.toString
  }
}
