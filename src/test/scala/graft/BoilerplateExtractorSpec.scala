package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{BoilerplateExtractor => BE, HtmlDom, LinkExtractor}

/** Pins the deterministic extractor: every `removeJunkData` branch of
  * the reference (crawler/utils/utils.py:283-455) has a fixture here.
  * These outputs are the rebuild's frozen contract — changing any of
  * them is a breaking change to per-url byte identity.
  */
class BoilerplateExtractorSpec extends AnyFunSuite {

  private val longText =
    "Spark rebuilds the crawl frontier as a typed dataset over parquet " +
    "snapshots and the extractor keeps only blocks whose sentences carry " +
    "enough words per text node to look like prose rather than chrome."

  test("head, script, style, form, img are stripped") {
    val html =
      s"""<html><head><title>T</title><script>var x=1;</script></head>
         |<body><style>.a{}</style><form><input type="text"></form>
         |<img src="x.png"><div>$longText</div></body></html>""".stripMargin
    val out = BE.extractText(html)
    assert(out === longText)
  }

  test("malformed script close tag is still stripped") {
    val html =
      s"""<html><body><script type="x">bad stuff</script foo="1" >
         |<div>$longText</div></body></html>""".stripMargin
    assert(BE.extractText(html) === longText)
  }

  test("xml comments and pre-html junk are removed") {
    val html =
      s"""garbage before <!-- note --><html><body><!-- inner
         |multiline comment --><div>$longText</div></body></html>""".stripMargin
    assert(BE.extractText(html) === longText)
  }

  test("link-dense nav block is removed") {
    val nav = """<div><a href="/a">Home</a> <a href="/b">About</a> <a href="/c">More</a></div>"""
    val html = s"<html><body>$nav<div>$longText</div></body></html>"
    assert(BE.extractText(html) === longText)
  }

  test("short-fragment boilerplate block is removed (integer division)") {
    // 4 text nodes of 4 words each: textwords/textcount = 16/4 = 4 < 5
    val junk = "<div><p>one two three four</p><p>five six seven eight</p>" +
      "<p>alpha beta gamma delta</p><p>nine ten eleven twelve</p></div>"
    val html = s"<html><body>$junk<div>$longText</div></body></html>"
    assert(BE.extractText(html) === longText)
  }

  test("empty block is removed") {
    val html = s"<html><body><div>   </div><div>$longText</div></body></html>"
    assert(BE.extractText(html) === longText)
  }

  test("embedded html inside body is removed") {
    val html = s"<html><body><div>$longText</div>" +
      "<html><body><div>inner junk</div></body></html></body></html>"
    assert(BE.extractText(html) === longText)
  }

  test("p and br become newlines; entities decode; nbsp becomes space") {
    val para1 = "The first paragraph of prose has enough words to survive " +
      "pruning because its sentences are long and carry many words each time."
    val para2 = "The second paragraph also has plenty of words so the block " +
      "stays intact through the link density and sentence length checks."
    val html = s"<html><body><div><p>$para1</p><p>$para2&nbsp;&amp;&nbsp;more</p></div></body></html>"
    val out = BE.extractText(html)
    assert(out.contains(para1))
    assert(out.contains(para2))
    // &nbsp; decodes to U+00A0 in the entity pass (as the reference's
    // ALL_ENTITIES decode does before stripHtml runs, utils.py:453)
    assert(out.contains("& more"))
    assert(out.split("\n").length >= 2)
  }

  test("extract is byte-identical across repeated runs") {
    val html = s"<html><body><div>$longText</div><div><a href='/x'>x</a></div></body></html>"
    val runs = (1 to 5).map(_ => BE.extractText(html))
    assert(runs.distinct.size === 1)
  }

  test("title extraction with entity decode and regex fallback") {
    assert(BE.extractTitle("<html><head><title>A &amp; B</title></head></html>") ===
      Some("A & B"))
    assert(BE.extractTitle("<notquitehtml><title>Raw</title>") === Some("Raw"))
    assert(BE.extractTitle("<html><body>no title</body></html>") === None)
  }

  test("stripHtml matches the reference regex pipeline") {
    assert(BE.stripHtml("<p>This is a test<br/> of strip</p>") ===
      "This is a test\n of strip")
    assert(BE.stripHtml("  <span>x</span> y ") === "x  y")
    // the first newline belongs to line 1; the blank-line run collapses
    // to a single newline (reference: utils.py:111-112 semantics)
    assert(BE.stripHtml("a\n\n\n\nb") === "a\n\nb")
  }

  test("extractLinks: absolute, relative, root, javascript, fragment, tracking") {
    val html =
      """<html><body>
        |<a href="http://other.com/abs">Abs</a>
        |<a href="rel.html">Rel</a>
        |<a href="/root.html">Root</a>
        |<a href="javascript:void(0)">JS</a>
        |<a href="#frag">Frag</a>
        |<a href="http://t.com/x?utm_source=a&id=7">Track</a>
        |</body></html>""".stripMargin
    val links = LinkExtractor.extractLinks(html, "http://site.com/dir/page.html")
    val urls = links.map(_.url)
    assert(urls.contains("http://other.com/abs"))
    assert(urls.contains("http://site.com/dir/rel.html"))
    assert(urls.contains("http://site.com/root.html"))
    assert(urls.contains("http://site.com/dir/page.html")) // javascript → site
    assert(urls.contains("http://t.com/x?id=7"))
    assert(links.find(_.url == "http://other.com/abs").get.title === Some("Abs"))
  }

  test("extractLinks honors <base href>") {
    val html =
      """<html><head><base href="http://cdn.com/base/"></head>
        |<body><a href="x.html">X</a></body></html>""".stripMargin
    val links = LinkExtractor.extractLinks(html, "http://site.com/page.html")
    assert(links.map(_.url).contains("http://cdn.com/base/x.html"))
  }

  test("DOM findAll / extract round trip") {
    val doc = HtmlDom.parse("<html><body><div id='a'><p>x</p></div><div>y</div></body></html>")
    val divs = doc.findAll(Set("div"))
    assert(divs.size === 2)
    divs.head.extract()
    assert(doc.findAll(Set("div")).size === 1)
  }
}
