package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adaptive re-crawl scheduling: estimate each URL's content change
  * rate from its own fetch history and derive the next revisit
  * interval — the public adaptive-revisit policy (Cho &
  * Garcia-Molina 2003, "Effective Page Refresh Policies for Web
  * Crawlers": revisit frequency proportional to the observed change
  * frequency). The reference schedules with a STATIC per-task
  * frequency (`frequency` config consumed by the crawl-frequency
  * gate, reference/crawler/baseconnector.py task fields; rebuilt as
  * P3 / `q_crawl_frequency_gate`); this operator is the adaptive
  * generalization that makes that frequency a per-URL function of
  * history — the static gate remains the cold-start special case.
  *
  * Arithmetic is integer-exact (milli change rate, truncating DIV)
  * so a SQL oracle states it verbatim:
  *
  *   change_rate_milli = (1000 · n_changes) DIV (n_fetches − 1)
  *                       (0 when fewer than 2 fetches — cold start)
  *   revisit_sec = min(maxIntervalSec,
  *                     (baseIntervalSec · 1000) DIV
  *                       max(change_rate_milli, minRateMilli))
  *
  * A page that changed on every refetch revisits at the base
  * interval; a static page backs off toward `maxIntervalSec`;
  * `minRateMilli` bounds the backoff so nothing is never re-checked.
  *
  * Scale shape at 10^10 URLs: one per-key window (partitioned by the
  * URL key — bounded by that URL's OWN fetch count, never
  * corpus-global) to compare consecutive content hashes, then one
  * key-rolled aggregate. Same partitioning discipline as
  * sessionization; no unbounded dimension, no broadcast, no collect.
  */
object Revisit {

  /** @param history   one row per (url-key, fetch) with a fetch
    *                  timestamp and the fetched content hash
    * @param keyCols   URL identity columns
    * @param tsCol     fetch timestamp column name
    * @param tieCol    deterministic tie-break within equal timestamps
    * @param contentCol content-hash column name (changes are detected
    *                  by inequality of consecutive values)
    * @return one row per key: keyCols ++ (n_fetches, n_changes,
    *         change_rate_milli, revisit_sec)
    */
  def changeRate(history: DataFrame, keyCols: Seq[String], tsCol: String,
                 tieCol: String, contentCol: String,
                 baseIntervalSec: Long = 3600L,
                 minRateMilli: Long = 100L,
                 maxIntervalSec: Long = 86400L): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    require(baseIntervalSec >= 1 && minRateMilli >= 1 && maxIntervalSec >= 1,
      "intervals and the rate floor must be positive")
    val keys: Seq[Column] = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val agg = history
      .withColumn("prev_", lag(col(contentCol), 1).over(w))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_fetches"),
        sum(when(col("prev_").isNotNull && col(contentCol) =!= col("prev_"),
          1L).otherwise(0L)).as("n_changes"))
      .withColumn("change_rate_milli",
        when(col("n_fetches") >= 2,
          expr("(1000 * n_changes) DIV (n_fetches - 1)")).otherwise(lit(0L)))
    agg.withColumn("revisit_sec",
      least(lit(maxIntervalSec),
        expr(s"(${baseIntervalSec}L * 1000L) DIV " +
          s"greatest(change_rate_milli, ${minRateMilli}L)")))
  }
}
