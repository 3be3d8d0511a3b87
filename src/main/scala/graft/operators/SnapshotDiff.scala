package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-snapshot diff: the change feed of an incremental re-crawl.
  *
  * Classifies every key across two snapshots of the same URL space as
  * `added` / `removed` / `changed` / `same` by content-hash comparison —
  * the per-wave report an E3 refresh run emits, and the feed the
  * adaptive-revisit estimator ([[Revisit.changeRate]]) consumes as its
  * per-URL change history. The reference computes the per-row version
  * of this inside its session-info update (`baseconnector.py`'s
  * skip/update decision, rebuilt as [[SessionInfo.check]]); the
  * snapshot-level diff is the set-complete form that also surfaces
  * additions and removals.
  *
  * Scale shape: ONE full-outer shuffle join on the key — both sides
  * partition by the same key, no window, no driver state. At 10^10 URLs
  * this is the same exchange the seen-set anti-join already pays.
  */
object SnapshotDiff {

  /** Diff `cur` against `prev` on `keyCol`, comparing `hashCol`.
    * Output: (keyCol, status) with status in
    * {added, removed, changed, same}.
    */
  def diff(prev: DataFrame, cur: DataFrame, keyCol: String,
      hashCol: String): DataFrame = {
    val p = prev.select(col(keyCol).as("k"), col(hashCol).as("h_prev"))
    val c = cur.select(col(keyCol).as("k"), col(hashCol).as("h_cur"))
    p.join(c, Seq("k"), "full_outer")
      .select(col("k").as(keyCol),
        when(col("h_prev").isNull, lit("added"))
          .when(col("h_cur").isNull, lit("removed"))
          .when(col("h_prev") =!= col("h_cur"), lit("changed"))
          .otherwise(lit("same")).as("status"))
  }
}
