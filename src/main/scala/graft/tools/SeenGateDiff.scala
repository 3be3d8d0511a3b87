package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Model.CrawlConfig
import graft.crawl.{SyntheticCorpus, WaveRunner}

/** Scratch diagnostic: the broadcast-exact seen gate and the shuffled
  * seen path MUST produce the identical crawl — diff them on a small
  * corpus and print where they diverge.
  */
object SeenGateDiff {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 50000L
    val spark = ScaleProbe.newSession(8) // EXACT probe session config
    val spec = SyntheticCorpus.Spec(numUrls = n,
      numHosts = math.max(50, (n / 100).toInt))
    val corpusPath = Files.createTempDirectory("sgd-corpus-").toString + "/c"
    SyntheticCorpus.generate(spark, spec, partitions = 64)
      .write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    def run(label: String, seenKeys: Long, bucket: Boolean = false) = {
      val base = CrawlConfig(maxDepth = 3,
        defaultMaxPerWave = (n * 4).toInt, maxWaves = 2,
        saltTarget = 20000L, assumeUniqueUrls = true,
        broadcastPopRows = n * 2, broadcastSeenKeys = seenKeys)
      val cfg = if (!bucket) base else base.copy(fetchBuckets = 64,
        fetchBucketDir = Some(s"$corpusPath-buckets-$label"),
        broadcastPopRows = 0L, fetchIngestVerifyCount = false)
      val stateRoot = Files.createTempDirectory(s"sgd-$label-").toString
      val runner = new WaveRunner(spark, corpus, stateRoot, cfg)
      val step = math.max(1, (n / 1500).toInt)
      runner.initSeeds((0L until n by step).map(i =>
        SyntheticCorpus.urlFor(i, spec) -> 1))
      runner.run()
      val order = runner.crawlOrder().select("urlHash", "wave").cache()
      val pages = runner.pages().select("urlHash").cache()
      println(s"[$label] order=${order.count()} pages=${pages.count()}")
      (order, pages)
    }
    val (oGate, pGate) = run("gate", 10000000L, bucket = true)
    val (oShuf, pShuf) = run("shuffle", 0L, bucket = true)
    println("order gate-only: " +
      oGate.join(oShuf, Seq("urlHash"), "left_anti").count())
    println("order shuffle-only: " +
      oShuf.join(oGate, Seq("urlHash"), "left_anti").count())
    val diff = oGate.join(oShuf, Seq("urlHash"), "left_anti")
      .limit(5).collect()
    diff.foreach(r => println("  gate-only row: " + r))
    println("per-wave gate: " +
      oGate.groupBy("wave").count().orderBy("wave").collect().mkString(", "))
    println("per-wave shuffle: " +
      oShuf.groupBy("wave").count().orderBy("wave").collect().mkString(", "))
    spark.stop()
  }
}
