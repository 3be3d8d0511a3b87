package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Model.{CrawlConfig, HostPolicy}
import graft.crawl.{SyntheticCorpus, WaveRunner}

/** Round-2 engine semantics: deferred-retry with bounded attempts
  * (reference requeue-self, baseconnector.py:158-181), the re-crawl
  * frequency gate (taskmanager.py:338-361), duplicate-capture inputs,
  * duplicate seeds, the crawl-delay budget cap, and plain-vs-bucketed
  * fetch-join equivalence.
  */
class RetryAndRecrawlSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-retry-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val spec = SyntheticCorpus.Spec(numUrls = 120, numHosts = 6)
  private lazy val corpus = SyntheticCorpus.generate(spark, spec).toDF()
  private def tmp(p: String) = Files.createTempDirectory(p).toString
  private val seedUrl = SyntheticCorpus.urlFor(0, spec)

  test("a deferred row is fetched in wave w+1 with attempt accounting") {
    val runner = new WaveRunner(spark, corpus, tmp("graft-defer-"),
      CrawlConfig(maxDepth = 1, defaultMaxPerWave = 10, maxWaves = 4))
    // transient refusal on the FIRST attempt only (the 429 analog)
    runner.deferInjector = Some(col("url") === seedUrl && col("attempts") === 0)
    runner.initSeeds(Seq(seedUrl -> 1, SyntheticCorpus.urlFor(7, spec) -> 1))
    runner.run()

    val tries = runner.processedT.read().get
      .filter(col("url") === seedUrl)
      .select("wave", "state", "attempts")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(tries.length === 2, s"expected defer-then-fetch, got ${tries.toSeq}")
    assert(tries(0) === ((1, "deferred", 1)))
    assert(tries(1)._2 === "fetched" && tries(1)._3 === 2)
    assert(tries(1)._1 === 2, "retry must land exactly one wave later")
    // the view resolves to the LATEST state
    val st = runner.frontierStates().filter(col("url") === seedUrl)
      .select("state").collect().head.getString(0)
    assert(st === "fetched")
  }

  test("deferrals stop after maxFetchAttempts and stay deferred") {
    val runner = new WaveRunner(spark, corpus, tmp("graft-defermax-"),
      CrawlConfig(maxDepth = 0, defaultMaxPerWave = 10, maxWaves = 6,
        maxFetchAttempts = 2))
    runner.deferInjector = Some(col("url") === seedUrl) // always refused
    runner.initSeeds(Seq(seedUrl -> 1, SyntheticCorpus.urlFor(7, spec) -> 1))
    runner.run()

    val tries = runner.processedT.read().get
      .filter(col("url") === seedUrl)
      .select("wave", "attempts").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(tries.toSeq === Seq((1, 1), (2, 2)), s"got ${tries.toSeq}")
    val st = runner.frontierStates().filter(col("url") === seedUrl)
      .select("state").collect().head.getString(0)
    assert(st === "deferred")
  }

  test("re-crawl frequency gate: eligible only after recrawlEveryWaves") {
    val runner = new WaveRunner(spark, corpus, tmp("graft-recrawl-"),
      CrawlConfig(maxDepth = 0, defaultMaxPerWave = 10, maxWaves = 4,
        recrawlEveryWaves = 2))
    runner.initSeeds(Seq(seedUrl -> 1))
    runner.run()

    val fetchWaves = runner.processedT.read().get
      .filter(col("url") === seedUrl && col("state") === "fetched")
      .select("wave").collect().map(_.getInt(0)).sorted.toSeq
    assert(fetchWaves === Seq(1, 3),
      s"fetched at wave 1, gated at 2, re-fetched at 3; got $fetchWaves")
    // idle waves (2 and 4) still account metrics, with nothing scheduled
    val m = runner.metrics().select("wave", "scheduled").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m(2) === 0L && m(4) === 0L && m(1) === 1L && m(3) === 1L)
  }

  test("duplicate captures of one url: latest warc_ts wins, no row fanout") {
    // the input shape legitimately holds multiple captures per url —
    // the fetch join must dedup, or the frontier join fans out
    val older = corpus.filter(col("url") === seedUrl)
      .withColumn("warc_ts", expr("warc_ts - interval 10 days"))
      .withColumn("html",
        encode(lit("<html><body><p>stale capture body text here</p></body></html>"), "utf-8"))
    val doubled = corpus.unionByName(older)

    val runner = new WaveRunner(spark, doubled, tmp("graft-dupcap-"),
      CrawlConfig(maxDepth = 1, defaultMaxPerWave = 10, maxWaves = 3))
    runner.initSeeds(Seq(seedUrl -> 1))
    runner.run()

    val rows = runner.pages().filter(col("url") === seedUrl).collect()
    assert(rows.length === 1, "exactly one processed row per popped url")
    // the latest capture's extracted text, not the stale one
    val expected = graft.core.BoilerplateExtractor.extractText(
      SyntheticCorpus.htmlFor(0, spec))
    assert(rows.head.getAs[String]("text") === expected)
    // no urlHash appears twice in the order log (no fanout into waves)
    val dupOrders = runner.crawlOrder().groupBy("urlHash").count()
      .filter(col("count") > 1).count()
    assert(dupOrders === 0)
  }

  test("duplicate seeds canonicalizing to one url keep min priority") {
    val runner = new WaveRunner(spark, corpus, tmp("graft-dupseed-"),
      CrawlConfig(maxDepth = 0, defaultMaxPerWave = 10, maxWaves = 2))
    runner.initSeeds(Seq(
      seedUrl -> 97,
      (seedUrl + "?utm_source=x") -> 1, // canonicalizes to seedUrl
      (seedUrl + "#frag") -> 5))
    runner.run()
    val frontier = runner.frontierT.read().get
      .filter(col("url") === seedUrl).collect()
    assert(frontier.length === 1, "one frontier row per canonical url")
    assert(frontier.head.getAs[Int]("priority") === 1)
    assert(runner.crawlOrder().count() === 1)
  }

  test("crawl-delay caps the per-wave host budget via the wave clock") {
    // 2 s delay under a 10 s wave clock ⇒ at most 5 fetches per host-wave
    val host = graft.core.UrlNormalizer.hostOf(seedUrl)
    val policies = Map(host -> HostPolicy(host, crawlDelayMs = 2000L, maxPerWave = 100))
    val runner = new WaveRunner(spark, corpus, tmp("graft-delay-"),
      CrawlConfig(maxDepth = 2, defaultMaxPerWave = 100, maxWaves = 3,
        waveDurationMs = 10000L),
      hostPolicies = policies)
    runner.initSeeds((0L until 30L).map(i => SyntheticCorpus.urlFor(i, spec) -> 1))
    runner.run()
    val hostOf = udf((u: String) => graft.core.UrlNormalizer.hostOf(u))
    val perWave = runner.crawlOrder()
      .withColumn("host", hostOf(col("url")))
      .filter(col("host") === host)
      .groupBy("wave").count().collect().map(_.getLong(1))
    assert(perWave.nonEmpty)
    assert(perWave.forall(_ <= 5), s"delay cap violated: ${perWave.toSeq}")
  }

  test("metrics backfill: a crash after the frontier flip still records the wave") {
    val root = tmp("graft-metricsbf-")
    val r1 = new WaveRunner(spark, corpus, root,
      CrawlConfig(maxDepth = 1, defaultMaxPerWave = 10, maxWaves = 2))
    r1.initSeeds(Seq(seedUrl -> 1))
    assert(r1.runWave(1))
    // simulate a crash that landed between the frontier flip and the
    // metrics commit: wipe the metrics table
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$root/metrics")).deleteRecursively()
    // a restarted job re-enters wave 1, sees it committed, and
    // backfills the metrics row from the staged counts
    val r2 = new WaveRunner(spark, corpus, root,
      CrawlConfig(maxDepth = 1, defaultMaxPerWave = 10, maxWaves = 2))
    assert(r2.runWave(1))
    val m = r2.metrics().filter(col("wave") === 1)
      .select("scheduled").collect()
    assert(m.length === 1 && m.head.getLong(0) === 1L,
      "wave-1 metrics must be backfilled on resume")
    assert(r2.extractCounter.value === 0, "backfill must not re-extract")
  }

  test("segment compaction: identical crawl state, bounded segment count") {
    val cfg = CrawlConfig(maxDepth = 2, defaultMaxPerWave = 15, maxWaves = 4)
    val plain = new WaveRunner(spark, corpus, tmp("graft-nocompact-"), cfg)
    plain.initSeeds(Seq(seedUrl -> 1, SyntheticCorpus.urlFor(3, spec) -> 2))
    plain.run()

    val compacted = new WaveRunner(spark, corpus, tmp("graft-compact-"),
      cfg.copy(compactEveryWaves = 2))
    compacted.initSeeds(Seq(seedUrl -> 1, SyntheticCorpus.urlFor(3, spec) -> 2))
    compacted.run()

    def order(r: WaveRunner) = r.crawlOrder().collect().map(_.toSeq).toSeq
    assert(order(compacted) === order(plain))
    assert(compacted.frontierT.read().get.count() === plain.frontierT.read().get.count())
    val segs = compacted.frontierT.currentManifest().get.segments.size
    assert(segs <= 3, s"compaction must bound segments, got $segs")
    // a wave after compaction still appends deltas on top
    assert(compacted.frontierT.committedWave() === plain.frontierT.committedWave())
  }

  test("bucketed co-partitioned fetch join ≡ plain broadcast join") {
    val cfgPlain = CrawlConfig(maxDepth = 2, defaultMaxPerWave = 15, maxWaves = 3)
    val plain = new WaveRunner(spark, corpus, tmp("graft-plainj-"), cfgPlain)
    plain.initSeeds(Seq(seedUrl -> 1, SyntheticCorpus.urlFor(3, spec) -> 2))
    plain.run()

    // broadcastPopRows = 0 forces the co-partitioned regime every wave
    val cfgBucketed = cfgPlain.copy(fetchBuckets = 4, broadcastPopRows = 0L)
    val bucketed = new WaveRunner(spark, corpus, tmp("graft-bucketj-"), cfgBucketed)
    bucketed.initSeeds(Seq(seedUrl -> 1, SyntheticCorpus.urlFor(3, spec) -> 2))
    bucketed.run()

    def order(r: WaveRunner) = r.crawlOrder().collect().map(_.toSeq).toSeq
    def seen(r: WaveRunner) = r.seen().select("urlHash", "contentHash")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSet
    assert(order(bucketed) === order(plain))
    assert(seen(bucketed) === seen(plain))
  }
}
