package graft.core

import java.util.regex.Pattern

/** Boolean keyword filtering over a tokenized document.
  *
  * Re-expresses the reference's KeywordFilter semantics (reference:
  * crawler/keywordfilter.py:22-136): expressions combine terms with
  * `and` / `or` / `not` and parentheses (shunting-yard, precedence
  * or < and < not); bare adjacent terms are implicitly AND-ed;
  * `"quoted phrases"` match on word boundaries in the raw text;
  * `pre*` matches any indexed word starting with `pre`; `*suf` any
  * word ending with `suf`; plain terms match the document's word
  * index. Everything is case-insensitive (the reference lowercases
  * both document and keyword).
  *
  * The expression is compiled ONCE (driver side) to an AST; evaluation
  * against a row's word set is allocation-free — suitable for use
  * inside a filter UDF over billions of rows, or broadcast to
  * executors as a plain serializable value.
  */
object KeywordFilter {

  sealed trait Expr extends Serializable {
    def eval(doc: DocIndex): Boolean
  }
  final case class Word(w: String) extends Expr {
    def eval(d: DocIndex): Boolean = d.words.contains(w)
  }
  final case class Prefix(p: String) extends Expr { // "pre*"
    def eval(d: DocIndex): Boolean = d.words.exists(_.startsWith(p))
  }
  final case class Suffix(s: String) extends Expr { // "*suf"
    def eval(d: DocIndex): Boolean = d.words.exists(_.endsWith(s))
  }
  final case class Phrase(phrase: String) extends Expr {
    @transient private lazy val re =
      Pattern.compile("\\b" + Pattern.quote(phrase) + "\\b",
        Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
    def eval(d: DocIndex): Boolean = re.matcher(d.text).find()
  }
  final case class And(l: Expr, r: Expr) extends Expr {
    def eval(d: DocIndex): Boolean = l.eval(d) && r.eval(d)
  }
  final case class Or(l: Expr, r: Expr) extends Expr {
    def eval(d: DocIndex): Boolean = l.eval(d) || r.eval(d)
  }
  final case class Not(e: Expr) extends Expr {
    def eval(d: DocIndex): Boolean = !e.eval(d)
  }

  /** Lowercased text + word index (reference: createindex,
    * keywordfilter.py:26-29). Words are maximal `[a-z0-9_']+` runs of
    * the lowercased text.
    */
  final case class DocIndex(text: String, words: Set[String])

  private val WordRun = Pattern.compile("[a-z0-9_']+")

  def index(text: String): DocIndex = {
    val lower = text.toLowerCase
    val m = WordRun.matcher(lower)
    val b = Set.newBuilder[String]
    while (m.find()) b += m.group()
    DocIndex(lower, b.result())
  }

  // --- tokenizer: words, quoted phrases, parens ---
  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object TAnd extends Tok
  private case object TOr extends Tok
  private case object TNot extends Tok
  private final case class TTerm(e: Expr) extends Tok

  private def tokenizeExpr(keyword: String): List[Tok] = {
    val s = keyword.toLowerCase
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LParen; i += 1 }
      else if (c == ')') { out += RParen; i += 1 }
      else if (c == '"') {
        val end = s.indexOf('"', i + 1)
        val stop = if (end < 0) s.length else end
        out += TTerm(Phrase(s.substring(i + 1, stop)))
        i = if (end < 0) s.length else end + 1
      } else {
        val start = i
        while (i < s.length && !s.charAt(i).isWhitespace &&
               s.charAt(i) != '(' && s.charAt(i) != ')' && s.charAt(i) != '"') i += 1
        s.substring(start, i) match {
          case "and" => out += TAnd
          case "or" => out += TOr
          case "not" => out += TNot
          case w if w.endsWith("*") && w.length > 1 => out += TTerm(Prefix(w.dropRight(1)))
          case w if w.startsWith("*") && w.length > 1 => out += TTerm(Suffix(w.drop(1)))
          case w if w.nonEmpty => out += TTerm(Word(w))
          case _ =>
        }
      }
    }
    out.toList
  }

  /** Compile a keyword expression; implicit AND between adjacent terms
    * (keywordfilter.py:84-89). Throws IllegalArgumentException on an
    * empty / unparseable expression.
    */
  def compile(keyword: String): Expr = {
    // insert implicit ANDs: term|')' followed by term|'('|'not'
    val toks = tokenizeExpr(keyword)
    require(toks.nonEmpty, s"empty keyword expression: '$keyword'")
    val withAnd = scala.collection.mutable.ListBuffer.empty[Tok]
    toks.zipWithIndex.foreach { case (t, i) =>
      if (i > 0) {
        val prev = toks(i - 1)
        val prevEnds = prev.isInstanceOf[TTerm] || prev == RParen
        val curStarts = t.isInstanceOf[TTerm] || t == LParen || t == TNot
        if (prevEnds && curStarts) withAnd += TAnd
      }
      withAnd += t
    }
    parseOr(withAnd.toList) match {
      case (e, Nil) => e
      case (e, rest) => rest.foldLeft(e) { // unbalanced ')' — be forgiving
        case (acc, _) => acc
      }
    }
  }

  // recursive descent: or := and ('or' and)* ; and := unary ('and' unary)*
  private def parseOr(toks: List[Tok]): (Expr, List[Tok]) = {
    var (l, rest) = parseAnd(toks)
    while (rest.headOption.contains(TOr)) {
      val (r, rest2) = parseAnd(rest.tail)
      l = Or(l, r); rest = rest2
    }
    (l, rest)
  }
  private def parseAnd(toks: List[Tok]): (Expr, List[Tok]) = {
    var (l, rest) = parseUnary(toks)
    while (rest.headOption.contains(TAnd)) {
      val (r, rest2) = parseUnary(rest.tail)
      l = And(l, r); rest = rest2
    }
    (l, rest)
  }
  private def parseUnary(toks: List[Tok]): (Expr, List[Tok]) = toks match {
    case TNot :: rest =>
      val (e, rest2) = parseUnary(rest)
      (Not(e), rest2)
    case LParen :: rest =>
      val (e, rest2) = parseOr(rest)
      (e, rest2 match { case RParen :: r => r; case r => r })
    case TTerm(e) :: rest => (e, rest)
    case other =>
      throw new IllegalArgumentException(s"unexpected token stream: $other")
  }

  /** Which of `keywords` match `text` (reference: checkFilter,
    * keywordfilter.py:32-45). Order preserved.
    */
  def matchedKeywords(text: String, keywords: Seq[String]): Seq[String] = {
    val doc = index(text)
    keywords.filter(k => compile(k).eval(doc))
  }
}
