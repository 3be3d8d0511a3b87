package graft.core

import java.sql.Timestamp

/** Typed data model of the crawl engine (SURVEY.md §7.1#1).
  *
  * `PageInput` is exactly the driver-specified input shape
  * (BASELINE.json input_hint): an Iceberg-style table of
  * Common-Crawl-like pages. Everything else is engine state persisted
  * as snapshot tables (see graft.state.SnapshotTable).
  */
object Model {

  /** One row of the input pages table: (url, warc_ts, html, text, lang). */
  final case class PageInput(
      url: String,
      warc_ts: Timestamp,
      html: Array[Byte],
      text: String,
      lang: String)

  /** Frontier states. A URL enters `Pending`, leaves as `Fetched`
    * (scheduled + extracted) or `Failed` (no page bytes available —
    * the 404 analog).
    */
  object FrontierState {
    val Pending = "pending"
    val Fetched = "fetched"
    val Failed = "failed"
  }

  /** One frontier row. `urlHash` = xxhash64(canonical url) is the join
    * identity everywhere — joins never touch raw URL strings
    * (SURVEY.md §7.4#6). `score` is the scheduling key: lower is
    * served first, mirroring the reference's min-heap (reference:
    * crawler/utils/priorityqueue.py:36; priority semantics
    * crawler/utils/taskmanager.py:157-167), with the rebuild's fixed
    * total order (score asc, urlHash asc) replacing the reference's
    * nondeterministic heap ties (SURVEY.md §7.4#2).
    */
  final case class FrontierEntry(
      urlHash: Long,
      url: String,
      host: String,
      depth: Int,
      priority: Int,
      score: Long,
      discoveredWave: Int,
      state: String)

  /** Scheduling score: priority dominates, then depth; urlHash breaks
    * ties at sort time. Packed so a single long column sorts correctly
    * and cheaply at 10^10 rows.
    */
  def score(priority: Int, depth: Int): Long =
    priority.toLong * 1000000L + depth.toLong

  /** URL-seen set row: url identity + content hash (enables the
    * reference's content-hash "unchanged ⇒ skip" incremental semantics,
    * crawler/utils/sessioninfomanager.py:56-86).
    */
  final case class SeenEntry(urlHash: Long, contentHash: String, wave: Int)

  /** Per-host politeness policy (crawl budget per wave + delay). */
  final case class HostPolicy(host: String, crawlDelayMs: Long, maxPerWave: Int)

  /** One robots.txt rule; `allow=false` is a Disallow line. */
  final case class RobotsRule(host: String, allow: Boolean, pathPrefix: String)

  /** Extracted page emitted by a wave. */
  final case class PageOut(
      urlHash: Long,
      url: String,
      wave: Int,
      title: String,
      text: String,
      contentHash: String,
      htmlBytes: Long,
      nOutlinks: Int)

  /** Crawl-order log row — the ordering-parity contract
    * (wave asc, score asc, urlHash asc).
    */
  final case class CrawlOrderEntry(wave: Int, score: Long, urlHash: Long, url: String)

  /** Per-wave metrics, mirroring the reference's CrawlerMetrics
    * (articles_crawled / articles_added / content_fetched,
    * crawler/model.py:178-187) plus frontier accounting.
    */
  final case class WaveMetrics(
      wave: Int,
      scheduled: Long,
      fetched: Long,
      failed: Long,
      contentBytes: Long,
      newUrls: Long,
      frontierPending: Long,
      elapsedMs: Long)

  /** Engine configuration. All values participate in the deterministic
    * replay contract except `simulateCrawlDelay` (a local-mode switch:
    * real deployments rate-limit inside the fetch partition; tests
    * must not sleep).
    */
  final case class CrawlConfig(
      maxDepth: Int = 1, // reference default max_recursion = 1 (crawler.cfg:197-198)
      defaultMaxPerWave: Int = 100,
      defaultCrawlDelayMs: Long = 0L,
      maxWaves: Int = 16,
      bloomFpp: Double = 0.01,
      /** below this many frontier keys no sketch is built (the exact
        * anti-join alone is cheaper than two sketch jobs per wave) */
      bloomMinFrontier: Long = 200000L,
      /** minimum capacity when the sketch is first built */
      bloomCapacity: Long = 10000000L,
      // a host whose pending mass exceeds this is salted over
      // ceil(mass/saltTarget) partitions (SURVEY.md §4 skew note)
      saltTarget: Long = 100000L,
      userAgent: String = "graft",
      simulateCrawlDelay: Boolean = false)
}
