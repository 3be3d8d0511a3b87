package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.UrlNormalizer

/** The live-fetch variant of the fetch stage (reference: _getHTML,
  * crawler/connectors/baseconnector.py:1140-1251 — SURVEY.md S3):
  * partition-parallel HTTP with per-host politeness enforced inside
  * the partition, bounded retries on retryable statuses, a MIME
  * whitelist, and a per-task fetch cap.
  *
  * The engine's normal fetch source is the input pages table
  * (input_hint); this operator exists for deployments that crawl the
  * live web. The transport is INJECTED (`fetchFn`) — this container
  * has zero egress, so the default transport is a clearly-marked
  * [STUB] that fails closed; tests inject a deterministic fake. The
  * Spark-side semantics (salted host partitioning, token-bucket delay,
  * retry/cap bookkeeping) are real and tested.
  */
object LiveFetch {

  /** Retryable conditions (reference retry list :1176-1181). */
  val RetryableStatuses: Set[Int] = Set(408, 500, 502, 503, 504)

  /** MIME whitelist (reference :62-66, abbreviated to the text types
    * the extractor consumes).
    */
  val MimeWhitelist: Set[String] = Set(
    "text/html", "text/plain", "text/xml", "application/xml",
    "application/xhtml+xml", "application/rss+xml", "application/atom+xml")

  final case class FetchResult(
      url: String,
      status: Int,
      mime: String,
      body: Array[Byte],
      attempts: Int)

  /** [STUB] real transport: would issue the HTTP GET with a 10s
    * timeout and UA header here. Zero-egress container ⇒ fails closed.
    */
  def noTransport(url: String): FetchResult =
    FetchResult(url, 599, "", Array.emptyByteArray, 1)

  /** Statuses that mean "try again a later wave" rather than
    * "terminally absent": rate-limit/cap deferrals plus retryables that
    * survived the in-task retry loop. These are the rows a live
    * deployment feeds back into the engine's Deferred path
    * (WaveRunner re-enqueues them after `retryBackoffWaves` with
    * bounded `maxFetchAttempts` — the reference's requeue-self,
    * baseconnector.py:158-181).
    */
  def deferredUrls(results: Dataset[FetchResult]): DataFrame =
    results.toDF()
      .filter(col("status") === 429 ||
        col("status").isin(RetryableStatuses.toSeq.map(Integer.valueOf): _*))
      .select(col("url"))

  /** Fetch a frontier slice. Input columns: url, host. Politeness:
    * rows are repartitioned by (host, salt) so one host's URLs land in
    * few partitions where the delay is enforceable locally; within a
    * partition consecutive requests to the same host honor
    * `crawlDelayMs` (token-bucket sleep). `maxFetchesPerTask` is the
    * reference's 1000-fetch loop guard (:1215-1220).
    */
  def fetch(spark: SparkSession, frontier: DataFrame,
            fetchFn: String => FetchResult = noTransport,
            crawlDelayMs: Long = 0L,
            maxRetries: Int = 3,
            maxFetchesPerTask: Int = 1000,
            saltSlots: Int = 4,
            numPartitions: Int = 0): Dataset[FetchResult] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    frontier
      .select(col("url"), col("host"),
        pmod(xxhash64(col("url")), lit(saltSlots)).as("salt"))
      .repartition(parts, col("host"), col("salt"))
      .select(col("url"), col("host"))
      .as[(String, String)]
      .mapPartitions { rows =>
        var fetched = 0
        var lastHost = ""
        var lastAt = 0L
        rows.map { case (url, host) =>
          if (fetched >= maxFetchesPerTask) {
            FetchResult(url, 429, "", Array.emptyByteArray, 0) // deferred
          } else {
            if (crawlDelayMs > 0 && host == lastHost) {
              val wait = lastAt + crawlDelayMs - System.currentTimeMillis()
              if (wait > 0) Thread.sleep(wait)
            }
            var attempt = 0
            var result: FetchResult = null
            while (attempt < maxRetries &&
                   (result == null || RetryableStatuses.contains(result.status))) {
              attempt += 1
              result = fetchFn(url)
            }
            lastHost = host
            lastAt = System.currentTimeMillis()
            fetched += 1
            val gated =
              if (result.status == 200 && !MimeWhitelist.contains(result.mime))
                result.copy(status = 415, body = Array.emptyByteArray)
              else result
            gated.copy(attempts = attempt)
          }
        }
      }
  }
}
