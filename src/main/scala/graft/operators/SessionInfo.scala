package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchical incremental-crawl state (the reference's path-tuple
  * session-info), re-expressed over DataFrames.
  *
  * The reference keys incremental state by PATH TUPLES `(a)`, `(a,b)`,
  * `(a,b,c)` — post / review / comment — each holding `{entity, hash}`
  * (structure doc: crawler/utils/sessioninfomanager.py:28-44):
  *
  *  - `checkSessionInfo` (sessioninfomanager.py:56-70) returns
  *    SKIP=true when the path is marked deleted, or — outside update
  *    mode — when the path is already known (its truth table is the
  *    comment block at sessioninfomanager.py:13-19);
  *  - `updateSessionInfo` (sessioninfomanager.py:72-90) inserts new
  *    paths and refreshes changed hashes, reporting `updated` only
  *    when something actually changed (unchanged hash ⇒ no page row
  *    emitted, htmlconnector.py:113-115);
  *  - deletes mark a path AND its descendants
  *    (`__markit`, sessioninfomanager.py:105-120), after which checks
  *    short-circuit the whole subtree;
  *  - connectors stop descending under a skipped parent
  *    (htmlconnector.py:60-61, amazonconnector.py:163-165) — re-crawls
  *    of hierarchical sources skip unchanged subtrees wholesale.
  *
  * Here the session state is a DataFrame keyed by the path ARRAY
  * (joined via a deterministic string key), all decisions are joins +
  * CASE (pure Catalyst, partitionable by pathKey at any scale), and the
  * subtree short-circuit is an explode of proper path prefixes
  * anti-joined against the skipped set.
  *
  * Schemas:
  *  - state:    (path: array<string>, entity, hash, deleted: boolean)
  *  - incoming: (path: array<string>, entity, hash)
  */
object SessionInfo {

  /** Path-array → stable join key. Unit separator keeps `["a","b"]`
    * distinct from `["a,b"]` for any realistic id alphabet.
    */
  val Sep = ""

  def pathKey(path: Column): Column = concat_ws(Sep, path)

  private def keyed(df: DataFrame): DataFrame =
    df.withColumn("pathKey", pathKey(col("path")))

  /** `checkSessionInfo`: annotate incoming rows with the reference
    * truth table — `exists`, `deleted`, and `skip` (true ⇒ the
    * connector would not process this path).
    */
  def check(state: DataFrame, incoming: DataFrame, updateMode: Boolean): DataFrame = {
    val st = keyed(state).select(col("pathKey"),
      lit(true).as("exists"), col("deleted"), col("hash").as("old_hash"))
    keyed(incoming)
      .join(st, Seq("pathKey"), "left")
      .withColumn("exists", coalesce(col("exists"), lit(false)))
      .withColumn("deleted", coalesce(col("deleted"), lit(false)))
      .withColumn("skip",
        col("deleted") || (if (updateMode) lit(false) else col("exists")))
  }

  /** Traversal short-circuit: drop incoming rows that sit UNDER a
    * skipped path (any proper ancestor ∈ `skippedPaths`). The skipped
    * rows themselves are assumed already removed by the caller's
    * `filter(!skip)`.
    */
  def pruneSubtrees(incomingRaw: DataFrame, skippedPaths: DataFrame): DataFrame = {
    val incoming = incomingRaw.distinct() // survivor counting needs unique rows
    val skipKeys = keyed(skippedPaths).select(col("pathKey").as("anc_key")).distinct()
    val properAncestors =
      when(size(col("path")) <= 1, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(col("path")) - 1),
          i => concat_ws(Sep, slice(col("path"), lit(1), i))))
    val withAncestors = incoming.withColumn("anc_key", explode_outer(properAncestors))
    // a row survives iff NONE of its ancestor keys is skipped
    withAncestors
      .join(skipKeys, Seq("anc_key"), "left_anti")
      .groupBy(incoming.columns.map(col): _*)
      .agg(count(lit(1)).as("surviving"))
      .filter(col("surviving") === size(col("path")) - 1 || size(col("path")) <= 1)
      .drop("surviving")
  }

  /** `updateSessionInfo`: annotate result rows with `updated` —
    * true for new paths and changed hashes, false when the stored hash
    * matches (the "don't emit a page row" signal).
    */
  def updateFlags(state: DataFrame, results: DataFrame): DataFrame = {
    val st = keyed(state).select(col("pathKey"), col("hash").as("old_hash"),
      col("deleted"))
    keyed(results)
      .join(st, Seq("pathKey"), "left")
      .withColumn("updated",
        !coalesce(col("deleted"), lit(false)) &&
          (col("old_hash").isNull || col("old_hash") =!= col("hash")))
      .drop("old_hash", "deleted", "pathKey")
  }

  /** Merge processed results into the state (the per-wave state
    * snapshot): result paths take the new `{entity, hash}`, untouched
    * state rows persist, deleted rows stay deleted and are NOT revived
    * (checks short-circuited them upstream; a result for a deleted
    * path is dropped, mirroring the reference's rollback-on-skip).
    */
  def merge(state: DataFrame, results: DataFrame): DataFrame = {
    val st = keyed(state)
    val res = keyed(results)
      .select(col("pathKey"), col("path"), col("entity"), col("hash"))
      // deterministic representative on duplicate result paths
      .groupBy(col("pathKey"))
      .agg(min(col("path")).as("path"), min(col("entity")).as("entity"),
        min(col("hash")).as("hash"))
    // new keys are those absent from the state entirely (deleted keys
    // ARE state keys, so one anti-join covers both cases)
    val incomingNew = res.join(st.select("pathKey"), Seq("pathKey"), "left_anti")
      .withColumn("deleted", lit(false))
    val refreshed = st
      .join(res.select(col("pathKey"), col("entity").as("new_entity"),
        col("hash").as("new_hash")), Seq("pathKey"), "left")
      .withColumn("entity",
        when(!col("deleted") && col("new_hash").isNotNull, col("new_entity"))
          .otherwise(col("entity")))
      .withColumn("hash",
        when(!col("deleted") && col("new_hash").isNotNull, col("new_hash"))
          .otherwise(col("hash")))
      .drop("new_entity", "new_hash")
    refreshed.unionByName(incomingNew)
      .select(col("path"), col("entity"), col("hash"), col("deleted"))
  }

  /** `doDeleteOnSessionInfo`/`__markit`: mark `prefix` and every
    * descendant deleted. Subsequent checks skip the whole subtree.
    */
  def markDeleted(state: DataFrame, prefix: Seq[String]): DataFrame = {
    val pk = prefix.mkString(Sep)
    keyed(state)
      .withColumn("deleted",
        col("deleted") ||
          col("pathKey") === pk ||
          col("pathKey").startsWith(pk + Sep))
      .drop("pathKey")
  }
}
