package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.crawl.WaveRunner

/** Structured-Streaming facade over the wave loop (SURVEY.md §7.1#7):
  * each micro-batch of a rate stream triggers one crawl wave via
  * `foreachBatch`, replacing the reference's 10-second crawlnode poll
  * loop (reference: crawler/crawlnode.py:113-130). State lives in the
  * runner's snapshot tables, so the stream is stateless from Spark's
  * point of view and restart-safe from ours: a restarted query simply
  * resumes at `frontier.committedWave + 1`.
  */
object CrawlStream {

  /** Start a streaming query that advances one wave per trigger until
    * the frontier drains (then it keeps ticking as a no-op; callers
    * stop it — or use `runBatches` for a bounded drive).
    */
  def start(spark: SparkSession, runner: WaveRunner,
            triggerMs: Long = 1000L): StreamingQuery = {
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", 1)
      .load()
      .writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        val next = runner.frontierT.committedWave() + 1
        runner.runWave(next)
        ()
      }
      .start()
  }

  /** Drive up to `maxWaves` waves synchronously through the streaming
    * facade (one processAllAvailable per wave tick).
    */
  def runBatches(spark: SparkSession, runner: WaveRunner, maxWaves: Int): Int = {
    val q = start(spark, runner, triggerMs = 50L)
    try {
      var waves = 0
      var last = runner.frontierT.committedWave()
      while (waves < maxWaves * 20 && runner.frontierT.committedWave() < maxWaves) {
        Thread.sleep(100)
        val now = runner.frontierT.committedWave()
        if (now == last && waves > 5) return now // drained
        last = now
        waves += 1
      }
      runner.frontierT.committedWave()
    } finally q.stop()
  }
}
