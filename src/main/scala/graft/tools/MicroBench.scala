package graft.tools

import graft.core.{BoilerplateExtractor, LinkExtractor}
import graft.crawl.SyntheticCorpus

/** Driver-side micro-measure of the per-page extract cost (sizes the
  * bench corpus so parallel work dominates fixed overhead).
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spec = SyntheticCorpus.Spec(numUrls = 100000, numHosts = 1000)
    val pages = (0 until 2000).map(i => SyntheticCorpus.htmlFor(i.toLong, spec))
    // warmup
    pages.take(500).foreach { h =>
      BoilerplateExtractor.extractText(h); LinkExtractor.extractLinks(h, "http://x.test/p/1")
    }
    val t0 = System.nanoTime()
    var chars = 0L
    pages.foreach { h =>
      chars += BoilerplateExtractor.extractText(h).length
      chars += LinkExtractor.extractLinks(h, "http://x.test/p/1").size
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"extract+links: ${sec * 1e6 / pages.size}%.1f us/page  ($chars)")
    val t1 = System.nanoTime()
    var gen = 0L
    (0 until 2000).foreach(i => gen += SyntheticCorpus.htmlFor(i.toLong + 5000, spec).length)
    println(f"htmlFor: ${(System.nanoTime() - t1) / 1e3 / 2000}%.1f us/page ($gen)")
  }
}
