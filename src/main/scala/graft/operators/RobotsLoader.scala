package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Model.RobotsRule

/** Derive per-host robots rules from the input pages table itself:
  * rows whose canonical url is `http(s)://host/robots.txt` are parsed
  * (Politeness.parseRobots) into the broadcastable rules dimension the
  * wave planner consumes. This closes the north-rule loop — robots
  * live in the same Iceberg-style table as every other fetched page,
  * no side channel.
  *
  * Scale shape: the robots subset is ~one row per host (tiny vs the
  * page table); the filter pushes down on the url suffix, and the
  * result is collected to the driver only because the wave planner
  * broadcasts it anyway.
  */
object RobotsLoader {

  def robotsRules(spark: SparkSession, pagesInput: DataFrame,
                  userAgent: String): (Seq[RobotsRule], Map[String, Long]) = {
    import spark.implicits._
    val robotsRows = pagesInput
      .filter(col("url").endsWith("/robots.txt"))
      .select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .collect()
    val rules = Seq.newBuilder[RobotsRule]
    val delays = Map.newBuilder[String, Long]
    robotsRows.foreach { case (url, bytes) =>
      val host = graft.core.UrlNormalizer.hostOf(url)
      if (host.nonEmpty && bytes != null) {
        val txt = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        val (hostRules, delay) = Politeness.parseRobots(host, txt, userAgent)
        rules ++= hostRules
        delay.foreach(d => delays += host -> d)
      }
    }
    (rules.result(), delays.result())
  }
}
