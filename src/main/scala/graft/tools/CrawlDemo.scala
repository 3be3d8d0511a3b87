package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.core.Model.{CrawlConfig, HostPolicy, RobotsRule}
import graft.crawl.{SyntheticCorpus, WaveRunner}

/** End-to-end crawl drive on the deterministic synthetic corpus:
  * seeds → waves → prints per-wave metrics, head of the crawl order,
  * and final state counts. Used by the verify workflow.
  */
object CrawlDemo {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-crawl-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spec = SyntheticCorpus.Spec(numUrls = n, numHosts = 20)
    val corpus = SyntheticCorpus.generate(spark, spec).toDF()
    val stateRoot = Files.createTempDirectory("graft-demo-").toString
    println(s"state root: $stateRoot")

    val config = CrawlConfig(maxDepth = 2, defaultMaxPerWave = 25, maxWaves = 5)
    val policies = Map("host0.test" -> HostPolicy("host0.test", 0L, 10))
    val robots = Seq(
      RobotsRule("host1.test", allow = false, pathPrefix = "/p/1"),
      RobotsRule("host1.test", allow = true, pathPrefix = "/p/12"))
    val runner = new WaveRunner(spark, corpus, stateRoot, config, policies, robots)
    runner.initSeeds(Seq(
      SyntheticCorpus.urlFor(0, spec) -> 1,
      SyntheticCorpus.urlFor(7, spec) -> 2,
      SyntheticCorpus.urlFor(42, spec) -> 97))

    val lastWave = runner.run()
    println(s"completed waves: $lastWave; rows extracted: ${runner.extractCounter.value}")
    println("metrics:")
    runner.metrics().orderBy("wave").show(20, truncate = false)
    println("crawl order (head):")
    runner.crawlOrder().show(15, truncate = false)
    println(s"pages: ${runner.pages().count()}, seen: ${runner.seen().count()}")
    println("sample page:")
    runner.pages().orderBy("urlHash").select("url", "title", "nOutlinks", "contentHash")
      .show(5, truncate = false)
    spark.stop()
  }
}
