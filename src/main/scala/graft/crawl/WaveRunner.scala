package graft.crawl

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{BoilerplateExtractor, Hashing, LinkExtractor, UrlNormalizer}
import graft.core.Model._
import graft.operators.{Politeness, SeenSet}
import graft.state.SnapshotTable

/** The crawl engine: an iterative-batch frontier loop over snapshot
  * tables (the Spark-native re-expression of the reference's
  * taskmaster/crawlnode/taskfeeder trio — SURVEY.md §3 E1-E3).
  *
  * Per wave:
  *  1. plan: pending frontier → robots filter → per-host budgeted pop
  *     (two-stage salted window — exact per-host top-k, skew-safe);
  *  2. fetch+extract: popped ⋈ pages-input on urlHash (the input table
  *     IS the fetch source per input_hint); deterministic boilerplate
  *     removal + outlink extraction in one pass over the html;
  *  3. expand: links → canonicalize → in-batch dedup → bloom-prefiltered
  *     anti-join against the frontier (URL-seen, SURVEY.md §2.4);
  *  4. commit: stage ONE processed artifact per wave (idempotent
  *     parquet; pages/order/seen are projections of it), then flip in
  *     a fixed order — adopt processed (atomic dir rename, zero jobs)
  *     → frontier rewrite → bloom advance → metrics. A kill at any
  *     point resumes without re-extracting anything (zero re-fetches):
  *     staged artifacts are reused, already-flipped tables are skipped.
  *
  * Determinism: every dataset in the loop is a pure function of
  * (input table, seeds, config); ordering contracts are total
  * (score asc, urlHash asc), so crawl order and final state are
  * identical across executor counts, partition counts and resumes.
  */
final class WaveRunner(
    spark: SparkSession,
    pagesInput: DataFrame,
    stateRoot: String,
    config: CrawlConfig = CrawlConfig(),
    hostPolicies: Map[String, HostPolicy] = Map.empty,
    robotsRules: Seq[RobotsRule] = Nil) {

  import spark.implicits._

  val frontierT = SnapshotTable(spark, stateRoot, "frontier")
  /** The per-wave fact log: every popped row with its fetch state,
    * extracted text, content hash and outlink count. The pages, order
    * and seen "tables" are PROJECTIONS of this log (one storage, three
    * views — commits are a single atomic directory adopt).
    */
  val processedT = SnapshotTable(spark, stateRoot, "processed")
  val metricsT = SnapshotTable(spark, stateRoot, "metrics")

  /** Rows actually put through fetch+extract this run — the probe the
    * resume test uses to assert zero re-fetches.
    */
  val extractCounter = spark.sparkContext.longAccumulator("graft.extracted")

  /** Test hook: crash-inject between the pages flip and the remaining
    * flips to exercise mid-wave resume.
    */
  private[graft] var failAfterPagesCommit: Boolean = false

  private val timing = sys.env.contains("GRAFT_TIMING")
  private def timed[T](label: String)(f: => T): T = {
    if (!timing) f
    else {
      val t0 = System.nanoTime()
      val r = f
      println(f"[graft-timing] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
  }

  // fetch source keyed by canonical-url hash; never joins on raw strings
  private val pagesByHash: DataFrame = pagesInput
    .select(xxhash64(col("url")).as("page_urlHash"),
      col("url").as("page_url"), col("html"))

  private val bloom = new FrontierBloom(stateRoot, config, () => frontierT.read())

  private def budgetFor = {
    val policies = hostPolicies // stable closure capture
    val default = config.defaultMaxPerWave
    udf { (host: String) =>
      policies.get(host).map(_.maxPerWave).getOrElse(default)
    }
  }

  /** Initialize the frontier from a seed list (url, priority). Commits
    * frontier wave 0. No-op if the frontier already exists (resume).
    */
  def initSeeds(seeds: Seq[(String, Int)]): Unit = {
    if (frontierT.exists()) return
    val entries = seeds.flatMap { case (url, priority) =>
      UrlNormalizer.canonicalize(url).map { canonical =>
        FrontierEntry(
          urlHash = Hashing.xxhash64(canonical),
          url = canonical,
          host = UrlNormalizer.hostOf(canonical),
          depth = 0,
          priority = priority,
          score = score(priority, 0),
          discoveredWave = 0,
          state = FrontierState.Pending)
      }
    }.distinct
    frontierT.commit(entries.toDS().toDF(), wave = 0)
    bloom.advance(0, frontierT.read().get)
  }

  /** Run waves until the frontier drains or maxWaves is hit; returns
    * the number of the last completed wave.
    */
  def run(): Int = {
    var wave = frontierT.committedWave() + 1
    var continue = true
    while (continue && wave <= config.maxWaves) {
      continue = runWave(wave)
      if (continue) wave += 1
    }
    frontierT.committedWave()
  }

  /** Execute (or resume) wave `w`. Returns false when there was nothing
    * left to schedule (crawl drained).
    */
  def runWave(w: Int): Boolean = {
    require(frontierT.exists(), "initSeeds must run before waves")
    if (frontierT.committedWave() >= w) {
      // crash landed between the frontier flip and the bloom advance:
      // catch the sketch chain up from the staged delta (advisory only
      // — a still-missing sketch just means exact-anti-join waves)
      val staged = Paths.get(stateRoot, "staging", s"wave_$w", "new_frontier")
      if (Files.exists(staged))
        bloom.advance(w, spark.read.parquet(staged.toString))
      return true
    }

    val t0 = System.nanoTime()
    val staging = Paths.get(stateRoot, "staging", s"wave_$w")
    val stagedMarker = staging.resolve("_STAGED")

    if (!Files.exists(stagedMarker)) {
      val didStage = timed(s"w$w stage")(stageWave(w, staging.toString))
      if (!didStage) return false // frontier drained
      Files.write(stagedMarker, Array.emptyByteArray)
    }

    // ---- commit phase: idempotent per table, fixed order ----
    // ONE staged artifact `processed` (all popped rows: wave, urlHash,
    // url, score, state, title, text, contentHash, htmlBytes, links,
    // nOutlinks) is ADOPTED by atomic directory rename — zero jobs —
    // and serves pages/order/seen as projections.
    if (processedT.committedWave() < w)
      timed(s"w$w adopt-processed")(
        processedT.adoptCommit(s"$staging/processed", w))
    if (failAfterPagesCommit)
      throw new IllegalStateException("simulated kill between table flips")
    val sp = processedT.readWaveSegment(w).get
    val stagedNew = spark.read.parquet(s"$staging/new_frontier")

    if (frontierT.committedWave() < w) timed(s"w$w commit-frontier") {
      val frontier = frontierT.read().get
      val updated = frontier
        .join(sp.select(col("urlHash"), col("state").as("new_state")),
          Seq("urlHash"), "left")
        .withColumn("state", coalesce(col("new_state"), col("state")))
        .drop("new_state")
        .unionByName(stagedNew)
      frontierT.commit(updated, w)
    }
    timed(s"w$w bloom-advance")(bloom.advance(w, stagedNew)) // incremental frontier-keys sketch
    if (metricsT.committedWave() < w) timed(s"w$w metrics") {
      // ONE aggregate over the staged artifact + a metadata-only count;
      // pending is tracked arithmetically (scheduled rows leave Pending,
      // newUrls enter — nothing else changes state)
      val agg = sp.agg(count(lit(1)),
        count(when(col("state") === FrontierState.Fetched, 1)),
        coalesce(sum("htmlBytes"), lit(0L))).head()
      val (scheduled, fetched, bytes) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
      val newUrls = stagedNew.count()
      val pendingLeft = pendingLeftAfter(w, scheduled, newUrls)
      pendingCache = Some(w -> pendingLeft)
      val m = WaveMetrics(w, scheduled, fetched, scheduled - fetched, bytes,
        newUrls, pendingLeft, (System.nanoTime() - t0) / 1000000L)
      metricsT.appendCommit(Seq(m).toDS().toDF(), w)
    }
    true
  }

  /** Pending count after wave w: previous pending − scheduled + new,
    * from the in-memory cache or the wave-(w-1) metrics row; a fresh
    * runner with no metrics history scans the (already wave-w) frontier
    * directly.
    */
  private var pendingCache: Option[(Int, Long)] = None
  private def pendingLeftAfter(w: Int, scheduled: Long, newUrls: Long): Long = {
    val before: Option[Long] = pendingCache match {
      case Some((wave, n)) if wave == w - 1 => Some(n)
      case _ if w >= 2 =>
        metricsT.read().flatMap { m =>
          m.filter(col("wave") === w - 1).select("frontierPending")
            .collect().headOption.map(_.getLong(0))
        }
      case _ => None // wave 1: before = the seed count
    }
    before match {
      case Some(n) => n - scheduled + newUrls
      case None =>
        frontierT.read().get.filter(col("state") === FrontierState.Pending).count()
    }
  }

  /** Compute a wave's artifacts into the staging dir. Returns false if
    * nothing is pending. This is the only phase that touches html; it
    * runs at most once per wave across kills/resumes.
    */
  private def stageWave(w: Int, staging: String): Boolean = {
    val frontier = frontierT.read().get
    val pending = frontier
      .filter(col("state") === FrontierState.Pending &&
        col("depth") <= config.maxDepth)
    val allowed = Politeness.robotsFilter(pending, robotsRules)

    // salt-slot counts: only hosts above saltTarget need slots > 1;
    // that set is small by construction, so it broadcasts.
    val heavyHosts = allowed.groupBy("host")
      .agg(count(lit(1)).as("pending_mass"))
      .filter(col("pending_mass") > config.saltTarget)
      .withColumn("saltSlots",
        Politeness.saltSlotsCol(col("pending_mass"), config.saltTarget))
      .select("host", "saltSlots")

    val withBudget = allowed
      .join(broadcast(heavyHosts), Seq("host"), "left")
      .withColumn("saltSlots", coalesce(col("saltSlots"), lit(1)))
      .withColumn("maxPerWave", budgetFor(col("host")))

    val popped = Politeness.popPerHost(withBudget)
      .select("urlHash", "url", "host", "depth", "priority", "score")

    // ---- fetch + extract: ONE pass over html, ONE staged artifact ----
    // Join shape matters at 100 TB: the popped side is budget-bounded
    // (≤ Σ host budgets) while the pages side is the whole table, so
    //  (a) fetched rows come from an INNER join with popped BROADCAST
    //      — the html column is probed in place and NEVER shuffled (a
    //      plain outer join silently degrades to sort-merge past
    //      autoBroadcastJoinThreshold and shuffles the page bytes);
    //  (b) the 404 analog (popped urls absent from the table) comes
    //      from a keys-only anti-join — an 8-byte column shuffle.
    // At popped sizes beyond broadcast reach, bucket both sides by
    // urlHash instead; (b) is unchanged.
    val counter = extractCounter
    val fetchedJoin = pagesByHash.join(broadcast(popped),
      popped("urlHash") === pagesByHash("page_urlHash"), "inner")

    val extracted = fetchedJoin
      .select(popped("urlHash"), col("url"), col("score"),
        col("depth"), col("priority"), col("html"))
      .as[(Long, String, Long, Int, Int, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (urlHash, url, scoreV, depth, priority, html) =>
          counter.add(1)
          val s = new String(html, UTF_8)
          val title = BoilerplateExtractor.extractTitle(s).getOrElse("No Title")
          val text = BoilerplateExtractor.extractText(s)
          val links = LinkExtractor.extractLinks(s, url)
            .map(_.url).filter(_ != url).distinct // self-link drop (F8)
          (urlHash, url, scoreV, FrontierState.Fetched, title, text,
            Hashing.contentHash(Seq(text, title)), // reference hash rule (O6)
            html.length.toLong, links.toArray, depth, priority)
        }
      }
      .toDF("urlHash", "url", "score", "state", "title", "text",
        "contentHash", "htmlBytes", "links", "depth", "priority")

    val failedRows = popped
      .join(pagesByHash.select(col("page_urlHash")),
        popped("urlHash") === col("page_urlHash"), "left_anti")
      .select(col("urlHash"), col("url"), col("score"),
        lit(FrontierState.Failed).as("state"), lit("").as("title"),
        lit("").as("text"), lit("").as("contentHash"), lit(0L).as("htmlBytes"),
        typedLit(Array.empty[String]).as("links"), col("depth"), col("priority"))

    val processed = extracted.unionByName(failedRows)

    timed(s"w$w fetch+extract+stage")(
      processed.withColumn("wave", lit(w))
        .withColumn("nOutlinks", size(col("links")))
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/processed"))

    // emptiness comes from the staged parquet's metadata (no separate
    // window materialization just to ask isEmpty)
    val sp = spark.read.parquet(s"$staging/processed")
    if (sp.count() == 0L) return false // frontier drained

    // ---- frontier expansion (E2) from the staged artifact (resume
    // never re-extracts): explode links, dedup, anti-join ----
    val candidates = sp
      .select(col("depth"), col("priority"), explode(col("links")).as("url"))
      .withColumn("urlHash", xxhash64(col("url")))
      // in-batch dedup (D4): deterministic representative per url —
      // min() everywhere (never first(), which is partition-order
      // dependent); lowest depth/priority wins = first-discovery rule
      .groupBy("urlHash")
      .agg(min(col("url")).as("url"),
        min(col("depth")).as("pdepth"), min(col("priority")).as("priority"))

    val frontierKeys = frontier.select("urlHash")
    val newEntries = SeenSet.notSeen(candidates, Some(frontierKeys), bloom.get(w - 1))
      .select(
        col("urlHash"), col("url"),
        udf((u: String) => UrlNormalizer.hostOf(u)).apply(col("url")).as("host"),
        (col("pdepth") + 1).as("depth"),
        col("priority"),
        (col("priority").cast("long") * 1000000L + col("pdepth") + 1).as("score"),
        lit(w).as("discoveredWave"),
        lit(FrontierState.Pending).as("state"))

    timed(s"w$w expand+stage-new")(
      newEntries.write.mode(SaveMode.Overwrite).parquet(s"$staging/new_frontier"))
    true
  }

  /** The crawl-order log (wave asc, score asc, urlHash asc) — the
    * ordering-parity contract output. A projection of the processed
    * log (Catalyst prunes the text columns out of the scan).
    */
  def crawlOrder(): DataFrame =
    processedT.read()
      .map(_.select(col("wave"), col("score"), col("urlHash"), col("url")))
      .getOrElse(spark.emptyDataset[CrawlOrderEntry].toDF())
      .orderBy(col("wave").asc, col("score").asc, col("urlHash").asc)

  /** URL-seen set: fetched rows' (urlHash, contentHash, wave). */
  def seen(): DataFrame =
    processedT.read()
      .map(_.filter(col("state") === FrontierState.Fetched)
        .select(col("urlHash"), col("contentHash"), col("wave")))
      .getOrElse(spark.emptyDataset[SeenEntry].toDF())

  /** Extracted pages: fetched rows with text/title/hash columns. */
  def pages(): DataFrame =
    processedT.read()
      .map(_.filter(col("state") === FrontierState.Fetched)
        .select(col("urlHash"), col("url"), col("wave"), col("title"),
          col("text"), col("contentHash"), col("htmlBytes"), col("nOutlinks")))
      .getOrElse(spark.emptyDataFrame)

  def metrics(): DataFrame =
    metricsT.read().getOrElse(spark.emptyDataset[WaveMetrics].toDF())
}
