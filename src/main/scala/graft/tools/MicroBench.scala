package graft.tools

import graft.core.{BoilerplateExtractor, LinkExtractor}
import graft.crawl.SyntheticCorpus

/** Driver-side micro-measure of the per-page extract cost (sizes the
  * bench corpus so parallel work dominates fixed overhead).
  * `--phases` breaks the fused extract pipeline into its stages so
  * optimization effort lands where the time actually goes.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spec = SyntheticCorpus.Spec(numUrls = 100000, numHosts = 1000)
    val pages = (0 until 2000).map(i => SyntheticCorpus.htmlFor(i.toLong, spec))
    if (args.contains("--phases")) { phases(pages); return }
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

  /** Per-stage timing of the fused wave extract (extractAll). */
  private def phases(pages: Seq[String]): Unit = {
    import graft.core.{BoilerplateExtractor => BE, HtmlDom}
    // warmup: full pipeline, twice
    (0 until 2).foreach(_ => pages.foreach(h => BE.extractAll(h, "http://x.test/p/1")))
    def timed[A](label: String)(f: String => A): Unit = {
      val t0 = System.nanoTime(); var acc = 0L
      pages.foreach { h => acc += (f(h) match {
        case s: String => s.length
        case x => x.hashCode & 1
      }) }
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e3 / pages.size}%8.1f us/page ($acc)")
    }
    timed("cleanedPage")(BE.cleanedPage)
    val cleaned = pages.map(BE.cleanedPage)
    locally {
      val t0 = System.nanoTime(); var acc = 0L
      cleaned.foreach(c => acc += HtmlDom.parse(c).children.length)
      println(f"${"parse"}%-22s ${(System.nanoTime() - t0) / 1e3 / pages.size}%8.1f us/page ($acc)")
    }
    locally {
      val docs = cleaned.map(HtmlDom.parse(_))
      val t0 = System.nanoTime(); var acc = 0L
      docs.foreach(d => acc += (if (BE.pruneParsed(d).children.nonEmpty) 1 else 0))
      println(f"${"prune (pre-pruned)"}%-22s ${(System.nanoTime() - t0) / 1e3 / pages.size}%8.1f us/page ($acc)")
    }
    val pruned = cleaned.map(c => BE.pruneParsed(HtmlDom.parse(c)))
    locally {
      val t0 = System.nanoTime(); var acc = 0L
      pruned.foreach(d => acc += HtmlDom.renderToString(d, decodeEntities = true).length)
      println(f"${"render+decode"}%-22s ${(System.nanoTime() - t0) / 1e3 / pages.size}%8.1f us/page ($acc)")
    }
    val rendered = pruned.map(HtmlDom.renderToString(_, decodeEntities = true))
    locally {
      val t0 = System.nanoTime(); var acc = 0L
      rendered.foreach(r => acc += BE.stripHtml(r).length)
      println(f"${"stripHtml"}%-22s ${(System.nanoTime() - t0) / 1e3 / pages.size}%8.1f us/page ($acc)")
    }
    timed("extractAll (total)")(h => BE.extractAll(h, "http://x.test/p/1").text)
  }
}
