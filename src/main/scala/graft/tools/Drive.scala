package graft.tools
object Drive { def main(args: Array[String]): Unit = {
import graft.core._
// A realistic mixed-quality page, the kind the crawl will actually see
val page = """
<!DOCTYPE html><!-- tracking --><junk>pre-html noise</junk>
<html><head><title>Graft &amp; Spark - Frontier</title>
<script>var t = "<div>fake</div>";</script><style>.x{color:red}</style></head>
<body>
<div class="nav"><a href="/">Home</a> | <a href="/about">About</a> | <a href="/contact">Contact</a></div>
<div id="content">
<p>The crawl frontier is rebuilt as a typed Spark dataset over immutable parquet snapshots so that every wave commits atomically and resumes without refetching anything at all.</p>
<p>Politeness budgets are enforced per host after a salted repartition spreads the largest hosts across workers while the seen set keeps false positives from dropping urls.</p>
</div>
<div class="footer"><a href="/tos">ToS</a> <a href="/priv">Privacy</a></div>
<div class="ads">buy now</div>
<a href="article2.html?utm_source=feed&id=9">Next article</a>
</body></html>"""
val text = BoilerplateExtractor.extractText(page)
println("TEXT >>>"); println(text); println("<<<")
println("TITLE: " + BoilerplateExtractor.extractTitle(page))
val links = LinkExtractor.extractLinks(page, "http://news.example.com/2026/story.html")
links.foreach(l => println("LINK: " + l))
println("CANON: " + UrlNormalizer.canonicalize("HTTP://News.Example.COM.:80/a/./b/../story.html?utm_campaign=x&q=1#top"))
println("HASH stable: " + (UrlNormalizer.urlHash("http://a.com/") == UrlNormalizer.urlHash("http://a.com/")))
// probes: garbage in, never throw
println("EMPTY: [" + BoilerplateExtractor.extractText("") + "]")
println("GARBAGE: [" + BoilerplateExtractor.extractText("<<<>>>%%% <a href=") + "]")
println("UNCLOSED: [" + BoilerplateExtractor.extractText("<html><body><div><p>never closed anywhere " * 3) + "]")
val deep = "<div>" * 5000 + "word " * 20 + ("</div>" * 5000)
println("DEEP-NEST len: " + BoilerplateExtractor.extractText("<html><body>" + deep).length)
println("KW: " + KeywordFilter.matchedKeywords("spark frontier crawl", Seq("spark and (crawl or flink)", "not frontier", "\"frontier crawl\"")))
println("KW-garbage: " + (try { KeywordFilter.compile(")(()").toString } catch { case e: Exception => "rejected: " + e.getClass.getSimpleName }))
} }
