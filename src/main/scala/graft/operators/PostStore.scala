package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.state.SnapshotTable

/** The post sink's three save modes (reference: saveToDB,
  * crawler/connectors/baseconnector.py:701-946; version modes
  * :779-809 — SURVEY.md S8/J6), re-expressed as MERGE-style snapshot
  * rewrites over a [[SnapshotTable]]:
  *
  *  - [[SaveMode.UpdateInPlace]]: matched keys take the incoming row,
  *    unmatched keep the old one (classic upsert);
  *  - [[SaveMode.Versioned]]: matched keys get a NEW row with
  *    version_number = old+1; old rows flip is_latest=false (SCD-2);
  *  - [[SaveMode.InsertNew]]: only previously-unseen keys append.
  *
  * Keys are (key) — in the reference (connector_instance, uri, path).
  * All plans are one join + one write; no driver-side loops.
  */
object PostStore {

  sealed trait SaveMode
  object SaveMode {
    case object UpdateInPlace extends SaveMode
    case object Versioned extends SaveMode
    case object InsertNew extends SaveMode
  }

  /** Merge `incoming` into `table` by `keyCol`. `incoming` must carry
    * the data columns; version bookkeeping columns (version_number,
    * is_latest) are managed here.
    */
  def save(spark: SparkSession, table: SnapshotTable, incoming: DataFrame,
           keyCol: String, mode: SaveMode, wave: Int): Unit = {
    val withVersion = incoming
      .withColumn("version_number", lit(1))
      .withColumn("is_latest", lit(true))
    val current = table.read()
    val merged = current match {
      case None => withVersion
      case Some(cur) => mode match {
        case SaveMode.UpdateInPlace =>
          // old rows whose key is NOT incoming + all incoming (keep the
          // old version number on replaced keys: in-place edit)
          val keys = withVersion.select(col(keyCol)).distinct()
          val kept = cur.join(keys, Seq(keyCol), "left_anti")
          val oldVersions = cur.select(col(keyCol), col("version_number").as("old_vn"))
          val replaced = withVersion
            .join(oldVersions, Seq(keyCol), "left")
            .withColumn("version_number", coalesce(col("old_vn"), lit(1)))
            .drop("old_vn")
          kept.unionByName(replaced)
        case SaveMode.Versioned =>
          // SCD-2: flip is_latest on matched old rows; append incoming
          // with version = max(old)+1
          val keys = withVersion.select(col(keyCol)).distinct()
          val latestVn = cur.groupBy(keyCol)
            .agg(max(col("version_number")).as("max_vn"))
          val flipped = cur
            .join(keys.withColumn("matched", lit(true)), Seq(keyCol), "left")
            .withColumn("is_latest",
              when(col("matched").isNotNull, lit(false)).otherwise(col("is_latest")))
            .drop("matched")
          val appended = withVersion
            .join(latestVn, Seq(keyCol), "left")
            .withColumn("version_number", coalesce(col("max_vn") + 1, lit(1)))
            .drop("max_vn")
          flipped.unionByName(appended)
        case SaveMode.InsertNew =>
          cur.unionByName(
            withVersion.join(cur.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti"))
      }
    }
    table.commit(merged, wave)
  }
}
