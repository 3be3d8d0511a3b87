package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming URL dedup — the D1/D4 seen-set semantics as a genuine
  * Structured Streaming operator for pipelines that ingest a LIVE
  * discovery stream instead of batch waves (the streaming twin of
  * [[graft.operators.SeenSet]], like [[Sessionize]] is the streaming
  * twin of the batch sessionizer).
  *
  * `dropDuplicatesWithinWatermark` keeps per-key state only inside the
  * watermark horizon: state is O(keys-per-horizon), not O(all keys
  * ever) — the property that lets the operator run indefinitely at
  * web scale (Spark's dropDuplicates WITHOUT a watermark grows state
  * forever, which at 10^10 urls is an OOM by design). The horizon is
  * the crawl's re-crawl frequency: a url re-appearing after the
  * horizon is legitimately schedulable again, which is exactly the
  * reference's crawl-frequency semantics (taskmanager.py:338-361)
  * expressed in event time.
  *
  * Output mode: append. The first arrival of each urlHash inside a
  * horizon survives; late rows older than the watermark are dropped
  * by the engine (consistent with the batch twin run on the
  * watermark-filtered input).
  */
object StreamDedup {

  /** Deduplicate a discovery stream by `urlHash` within the event-time
    * horizon. Input must carry an event-time column `ts` (timestamp)
    * and a `urlHash` column.
    */
  def dedupStream(discoveries: DataFrame, horizon: String): DataFrame =
    discoveries
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("urlHash")

  /** Drive the REAL streaming operator over pre-staged micro-batches
    * of (urlHash, sec) rows and return the emitted rows as a batch
    * DataFrame — the verification seam that lets a SQL oracle gate the
    * streaming twin end to end: in-horizon suppression across
    * micro-batches, watermark advance, state expiry and post-horizon
    * re-emission all happen through the genuine
    * `dropDuplicatesWithinWatermark` state store. Batches are
    * driver-side Seqs: VERIFICATION-scale only (the production entry
    * is [[dedupStream]] on a live readStream source).
    */
  /** @param statePartitions number of state-store partitions for the
    *   replay's streaming query (`spark.sql.shuffle.partitions` at
    *   query start, restored afterwards). A replay of N driver-staged
    *   rows wants state shards ∝ N, not the session's batch-join
    *   parallelism: every micro-batch pays a fixed open/commit cost
    *   PER STATE PARTITION, so 32 shards for a few thousand keys is
    *   pure overhead (measured 2× the replay wall at sf0.1). None
    *   leaves the session setting untouched.
    */
  def replayBatches(spark: SparkSession, batches: Seq[Seq[(Long, Long)]],
                    horizon: String,
                    statePartitions: Option[Int] = None): DataFrame = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, Long)]
    val in = ms.toDF().toDF("urlHash", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val name = s"graft_stream_dedup_replay_${replaySeq.incrementAndGet()}"
    // state-store checkpoints on tmpfs when available: the default
    // java.io.tmpdir sits on this sandbox's one throttled virtio disk,
    // and every micro-batch fsyncs delta+commit files per state
    // partition — placement, not semantics (the same policy as the
    // engine's crawl-state dirs; a cluster writes these to its DFS)
    val ckptBase =
      if (Files.isDirectory(Paths.get("/dev/shm"))) Paths.get("/dev/shm")
      else Paths.get(System.getProperty("java.io.tmpdir"))
    val ckptDir = Files.createTempDirectory(ckptBase, "graft-stream-ckpt-")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    val q = dedupStream(in, horizon)
      .select(col("urlHash"), col("sec"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir.toString)
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      try {
        import scala.sys.process._
        Seq("rm", "-rf", ckptDir.toString).!
      } catch { case _: Exception => }
    }
    // pin the result: the memory-sink table is bound to the (stopped)
    // streaming query; downstream writes want a standalone frame
    val out = spark.table(name)
      .select(col("urlHash").as("url_hash"), col("sec"))
      .localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  private val replaySeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Batch twin for parity checks: first arrival per key by (ts, then
    * tie-break on every remaining column via min(struct)) — what the
    * stream converges to when every row fits one horizon.
    */
  def dedupBatch(discoveries: DataFrame): DataFrame = {
    val cols = discoveries.columns.filterNot(_ == "urlHash")
    discoveries.groupBy(col("urlHash"))
      .agg(min(struct(cols.map(col): _*)).as("r"))
      .select(col("urlHash") +: cols.map(c => col(s"r.$c")): _*)
  }
}
