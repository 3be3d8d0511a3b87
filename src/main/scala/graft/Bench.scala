package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.Model.CrawlConfig
import graft.crawl.{SyntheticCorpus, WaveRunner}

/** Per-round benchmark. Prints ONE JSON line:
  * {"metric":...,"value":totalSec,"unit":"sec","queries":{...},"sf":...}
  *
  * Two parts:
  *  1. crawl throughput (the BASELINE.json headline: URLs
  *     scheduled+extracted per second) over a deterministic synthetic
  *     corpus — measured at cores/4 and at cores on the SAME input to
  *     evidence the N→4N scaling-efficiency criterion (no real cluster
  *     in this sandbox; see BASELINE.md). A JIT warm-up crawl runs
  *     first so neither timed run pays compilation;
  *  2. wall time of every SparkEntry query at `cores`, fully
  *     materialized via the noop sink (count() would let Catalyst
  *     prune the very columns we mean to measure).
  */
object Bench {

  /** Scaling corpus: fixed size (not sf-scaled) so round-over-round
    * numbers compare; sized so parallel work dominates fixed per-wave
    * costs (~600k pages ≈ 4 min of single-core extract+expand work).
    */
  val ScaleUrls: Long = sys.env.getOrElse("SPARK_GRAFT_BENCH_URLS", "2400000").toLong

  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // html extraction is CPU-bound per byte: small splits fan the
      // scan out to all cores (128m default = a handful of tasks)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      // shuffle/spill on tmpfs too: /tmp sits on the sandbox's one
      // throttled virtio disk and its writeback noise swamps the
      // measurement (a cluster's shuffle IO scales with executors)
      .config("spark.local.dir",
        if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
          "/dev/shm/graft-spark-local" else "/tmp")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def spec = SyntheticCorpus.Spec(
    numUrls = ScaleUrls, numHosts = math.max(50, (ScaleUrls / 100).toInt))

  /** One crawl: seeds = every 4th url (so wave 1 is already fetch-heavy
    * and wave 2 covers most of the rest — the work-dominated regime a
    * production frontier lives in). Returns (urls, sec, urls/sec).
    */
  def crawlBench(spark: SparkSession, corpusPath: String, seedsN: Int,
                 label: String): (Long, Double, Double) = {
    // crawl state on tmpfs: the sandbox's single throttled virtio disk
    // would serialize state IO that a real cluster spreads across
    // executors' disks/DFS — measure compute scaling, not one disk
    val stateRoot = Files.createTempDirectory(
      if (Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
        java.nio.file.Paths.get("/dev/shm") else java.nio.file.Paths.get("/tmp"),
      s"graft-bench-$label-").toString
    // the synthetic corpus is one capture per url; pops at this wave
    // size stay broadcastable (the gated non-broadcast regime is
    // exercised by tests + the bucketed equivalence spec)
    val runner = new WaveRunner(spark, spark.read.parquet(corpusPath), stateRoot,
      CrawlConfig(maxDepth = 3, defaultMaxPerWave = 1000000, maxWaves = 2,
        saltTarget = 20000L, assumeUniqueUrls = true,
        broadcastPopRows = ScaleUrls * 2))
    val s = spec
    val step = math.max(1, (s.numUrls / seedsN).toInt)
    runner.initSeeds((0L until s.numUrls by step).map(i =>
      SyntheticCorpus.urlFor(i, s) -> 1))
    val t0 = System.nanoTime()
    runner.run()
    val sec = (System.nanoTime() - t0) / 1e9
    val urls = runner.crawlOrder().count() + runner.pages().count()
    // free the tmpfs state (RAM) before the next measurement
    try {
      import scala.sys.process._
      Seq("rm", "-rf", stateRoot).!
    } catch { case _: Exception => }
    (urls, sec, urls / sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val smallCores = math.max(2, cores / 4)

    // ---- corpus (generation excluded from timing; cached on disk) ----
    val prep = newSession(cores)
    val shm = java.nio.file.Paths.get("/dev/shm")
    val corpusBase = if (Files.isDirectory(shm)) "/dev/shm" else "target"
    val corpusPath = s"$corpusBase/graft-bench-corpus-$ScaleUrls"
    if (!Files.exists(Paths.get(corpusPath, "_SUCCESS"))) {
      SyntheticCorpus.generate(prep, spec, partitions = cores * 4)
        .write.mode("overwrite").parquet(corpusPath)
    }
    crawlBench(prep, corpusPath, seedsN = 1500, label = "warmup") // JIT
    prep.stop()

    // ---- crawl at N and 4N cores, same input; warm up INSIDE each
    // session (codegen classes are per-session, a cold session's first
    // big run pays compilation) ----
    def bestOf2(session: SparkSession, label: String): (Long, Double, Double) = {
      crawlBench(session, corpusPath, seedsN = 1500, label = s"warm-$label")
      val a = crawlBench(session, corpusPath, seedsN = (ScaleUrls / 4).toInt, label = label)
      val b = crawlBench(session, corpusPath, seedsN = (ScaleUrls / 4).toInt, label = label)
      if (a._2 <= b._2) a else b // min wall time damps host noise
    }
    val sSmall = newSession(smallCores)
    val (_, secSmall, tputSmall) = bestOf2(sSmall, s"c$smallCores")
    sSmall.stop()
    val sBig = newSession(cores)
    val (urlsBig, secBig, tputBig) = bestOf2(sBig, s"c$cores")
    val speedup = secSmall / secBig
    val efficiency = speedup / (cores.toDouble / smallCores)

    // ---- query timings (reuse the big-core session) ----
    // a crashing query must NOT be silently recorded as a fast success:
    // failures are flagged with a negative time and listed by name
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(sBig, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] query $name FAILED: ${e.getMessage}")
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -sec)
    }
    val failed = results.collect { case (n, s) if s < 0 => n }
    val querySec = results.map(r => math.abs(r._2)).sum
    val total = querySec + secBig

    val extra = Seq(
      s""""crawl_urls":$urlsBig""",
      s""""crawl_sec_c$cores":${f"$secBig%.2f"}""",
      s""""crawl_urls_per_sec_c$cores":${f"$tputBig%.1f"}""",
      s""""crawl_sec_c$smallCores":${f"$secSmall%.2f"}""",
      s""""crawl_urls_per_sec_c$smallCores":${f"$tputSmall%.1f"}""",
      s""""scaling_speedup_${smallCores}_to_$cores":${f"$speedup%.3f"}""",
      s""""scaling_efficiency":${f"$efficiency%.3f"}""",
      s""""query_failures":${failed.size}""")
    val qs = (results.map { case (k, v) => s""""$k":${f"$v%.3f"}""" } ++ extra)
      .mkString("{", ",", "}")
    println(s"""{"metric":"crawl urls scheduled+extracted/sec @${cores}c: ${f"$tputBig%.1f"}; scaling eff ${smallCores}c->${cores}c: ${f"$efficiency%.3f"}; query total sec","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    sBig.stop()
  }
}
