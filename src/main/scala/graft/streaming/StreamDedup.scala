package graft.streaming

import org.apache.spark.sql.DataFrame
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
