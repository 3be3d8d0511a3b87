package graft.crawl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Model.CrawlConfig

/** The fetch side of the wave loop: in our input shape the page bytes
  * already sit in the input table (BASELINE input_hint), so "fetch" is
  * a join of the popped frontier rows against that table on urlHash.
  *
  * Join-shape policy at 10^10 scale (the part that must not be a
  * one-size-fits-all broadcast):
  *
  *  - popped ≤ `broadcastPopRows`  → INNER join with the POPPED side
  *    broadcast: the html column is probed in place, never exchanged.
  *  - popped above the threshold   → co-partitioned SHUFFLE-HASH join.
  *    With `fetchBuckets` > 0 the source was ingested ONCE as a table
  *    bucketed by urlHash (latest capture per url), so the pages side
  *    needs NO exchange — only the popped keys shuffle to the bucket
  *    count. Without bucketing the join still runs (AQE picks the
  *    strategy) but pays one wave-scoped shuffle — the bucketed source
  *    is the designed scale path.
  *
  * Multiple captures per url (Common-Crawl-like `warc_ts` history) are
  * legal in the input. The bucketed ingest dedups to the latest capture
  * up front; the plain path dedups AFTER the join with a partial-agg
  * `max_by` keyed on (warc_ts, xxhash64(html)) — a total order, so the
  * survivor is deterministic — and that exchange carries only the
  * wave's MATCHED rows (the bytes being extracted anyway), never the
  * table.
  */
final class FetchSource(
    spark: SparkSession,
    pagesInput: DataFrame,
    stateRoot: String,
    config: CrawlConfig) {

  /** Plain projection of the input keyed by canonical-url hash. */
  private val plain: DataFrame = pagesInput
    .select(xxhash64(col("url")).as("page_urlHash"), col("warc_ts"), col("html"))

  private val bucketDir =
    config.fetchBucketDir.getOrElse(s"$stateRoot/fetch_bucketed")
  private val tableName =
    "graft_fetch_" + java.lang.Long.toHexString(graft.core.Hashing.xxhash64(bucketDir))

  /** True when joins run against the bucketed ingest (pre-deduped). */
  val bucketed: Boolean = config.fetchBuckets > 0

  private def ingestMetaPath = Paths.get(bucketDir, "_graft_ingest.meta")

  /** Fingerprint of the INPUT the bucketed table was ingested from
    * (pre-dedup row count + schema DDL). A resumed crawl whose
    * pagesInput gained captures must not silently join a stale
    * snapshot — [[verifyIngest]] fails loudly on mismatch.
    */
  private def writeIngestMeta(inputRows: Long): Unit =
    Files.write(ingestMetaPath,
      s"$inputRows\n${pagesInput.schema.toDDL}\n".getBytes("UTF-8"))

  private def verifyIngest(): Unit = {
    if (!Files.exists(ingestMetaPath)) return // pre-fingerprint ingest
    val lines = new String(Files.readAllBytes(ingestMetaPath), "UTF-8")
      .split("\n", 2)
    val wantSchema = lines(1).trim
    val gotSchema = pagesInput.schema.toDDL
    if (gotSchema != wantSchema)
      throw new IllegalStateException(
        s"bucketed fetch table at $bucketDir was ingested from an input " +
          s"with schema [$wantSchema] but the current pagesInput has " +
          s"[$gotSchema]; delete the directory to re-ingest")
    if (config.fetchIngestVerifyCount) {
      val wantRows = lines(0).trim.toLong
      val gotRows = pagesInput.count()
      if (gotRows != wantRows)
        throw new IllegalStateException(
          s"bucketed fetch table at $bucketDir was ingested from " +
            s"$wantRows input rows but the current pagesInput has $gotRows " +
            s"(captures appended or removed); delete the directory to " +
            s"re-ingest, or set fetchIngestVerifyCount=false to accept " +
            s"an immutable-input contract")
    }
  }

  /** The fetch source DataFrame. Bucketed mode materializes (once) a
    * table CLUSTERED BY page_urlHash holding the latest capture per
    * url; the one-time shuffle is amortized over every subsequent wave,
    * which joins with zero exchange on the pages side. Idempotent and
    * session-restart-safe: an existing directory is re-registered in
    * the (in-memory) catalog via DDL instead of rewritten — after the
    * input fingerprint check (schema always; row count unless
    * `fetchIngestVerifyCount` is off).
    */
  lazy val source: DataFrame =
    if (!bucketed) plain
    else {
      val nb = config.fetchBuckets
      if (!spark.catalog.tableExists(tableName)) {
        if (!Files.exists(Paths.get(bucketDir, "_SUCCESS"))) {
          val obs = org.apache.spark.sql.Observation(
            s"graft-ingest-${tableName.takeRight(8)}")
          val w = Window.partitionBy("page_urlHash")
            .orderBy(col("warc_ts").desc, xxhash64(col("html")).desc)
          plain
            .observe(obs, count(lit(1)).as("input_rows"))
            .repartition(nb, col("page_urlHash"))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1).drop("rn")
            .write.bucketBy(nb, "page_urlHash").sortBy("page_urlHash")
            .option("path", bucketDir).format("parquet")
            .mode("overwrite").saveAsTable(tableName)
          writeIngestMeta(obs.get("input_rows").asInstanceOf[Long])
        } else {
          verifyIngest()
          val ddlSchema = plain.schema.toDDL
          spark.sql(
            s"""CREATE TABLE $tableName ($ddlSchema) USING parquet
               |CLUSTERED BY (page_urlHash) SORTED BY (page_urlHash)
               |INTO $nb BUCKETS LOCATION '$bucketDir'""".stripMargin)
        }
      }
      spark.table(tableName)
    }

  /** Fetched rows for a popped set: popped columns + the page html,
    * exactly one row per popped urlHash present in the table (latest
    * capture wins). `poppedRows` drives the broadcast gate — it comes
    * free from the staged-pop write's Observation.
    */
  def fetched(popped: DataFrame, poppedRows: Long): DataFrame = {
    val small = poppedRows <= config.broadcastPopRows
    // the broadcast relation is built SERIALLY on the driver — shed
    // every byte it doesn't need: host is a pure function of the
    // canonical url (host_of, codegen'd; ≡ UrlNormalizer.hostOf, the
    // equivalence is test-pinned), so it is recomputed after the join
    // instead of riding the broadcast
    val p = if (small) broadcast(popped.drop("host")) else popped.hint("shuffle_hash")
    val joined = source
      .join(p, p("urlHash") === col("page_urlHash"), "inner")
    val cols =
      if (small) Seq("url", "depth", "priority", "score", "attempts", "priorHash")
      else Seq("url", "host", "depth", "priority", "score", "attempts", "priorHash")
    val out =
      if (bucketed || config.assumeUniqueUrls)
        // bucketed ingest already deduped to one capture per url;
        // assumeUniqueUrls declares the input a deduplicated snapshot
        joined.select((col("urlHash") +: cols.map(col) :+ col("html")): _*)
      else
        joined
          .groupBy(col("urlHash"))
          .agg(max_by(struct((cols.map(col) :+ col("html")): _*),
            struct(col("warc_ts"), xxhash64(col("html")))).as("r"))
          .select((col("urlHash") +: cols.map(c => col(s"r.$c")) :+ col("r.html")): _*)
    if (small) out.withColumn("host", graft.plans.HostOf.host_of(col("url")))
    else out
  }

}
