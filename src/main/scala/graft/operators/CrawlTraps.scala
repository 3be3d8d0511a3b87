package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-trap detection: URL-template explosion per host.
  *
  * A crawler trap (calendar widgets, session-id links, faceted search,
  * infinite pagination) manifests as ONE url *template* — the path with
  * digit runs collapsed — accounting for an unbounded number of distinct
  * URLs on a host. The reference bounds traps only indirectly, via the
  * recursion-depth gate (`crawler/crawler.py` recursion config, rebuilt
  * as F6/K3) and the per-task fetch cap (K6); template explosion is the
  * *direct*, scale-time signal a 10^10-URL frontier needs so one
  * calendar widget cannot consume a host's whole politeness budget.
  *
  * Scale shape: one groupBy (host, template) with a two-phase distinct
  * count — no window, no self-join. The (host, template) dimension is
  * bounded by each host's real page-type count, not by its URL count,
  * so the aggregate output stays small even when the trap itself is
  * huge; the verdict column is what the frontier-expansion stage would
  * anti-join new links against (the same bounded-build-side shape as
  * [[Dedup.lineFrequencyDedup]]).
  */
object CrawlTraps {

  /** Host part of a URL; empty string when unparseable (both engines'
    * regexp_extract return '' on no match).
    */
  def hostOf(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/?#]+)", 1)

  /** Trap signature: the path with every digit run collapsed to 'D'.
    * Query strings and fragments never participate (they are stripped
    * upstream by the canonicalizer's tracking-param rules, O1).
    */
  def templateOf(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[a-z]+://[^/?#]+(/[^?#]*)", 1), "[0-9]+", "D")

  /** Per-(host, template) distinct-URL counts with a trap verdict:
    * `trap = n_urls > maxUrlsPerTemplate`.
    */
  def trapTemplates(urls: DataFrame, urlCol: String,
      maxUrlsPerTemplate: Long): DataFrame =
    urls
      .select(hostOf(col(urlCol)).as("host"),
        templateOf(col(urlCol)).as("template"), col(urlCol).as("u"))
      .groupBy("host", "template")
      .agg(countDistinct(col("u")).as("n_urls"))
      .withColumn("trap", col("n_urls") > maxUrlsPerTemplate)
}
