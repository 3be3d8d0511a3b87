package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---- EAV dynamic entities (reference baseconnector.py:896-928) ----

  /** Field-prefix → storage type, exactly the reference's map
    * (baseconnector.py:106): et_/es_/s_ text, edate_ date, ei_ integer,
    * ef_ float.
    */
  def eavType(key: Column): Column =
    when(key.startsWith("ei_"), lit("integer"))
      .when(key.startsWith("ef_"), lit("float"))
      .when(key.startsWith("edate_"), lit("date"))
      .otherwise(lit("text"))

  /** Normalize a dynamic-entities map column for storage: text values
    * truncate to 2000 chars (reference baseconnector.py:910-912).
    * Pure Catalyst (map_from_arrays over transformed entries).
    */
  def eavStoreMap(entities: Column): Column =
    map_from_arrays(
      map_keys(entities),
      transform(map_entries(entities),
        e => when(eavType(e.getField("key")) === "text",
          substring(e.getField("value"), 1, 2000))
          .otherwise(e.getField("value"))))

  /** Typed read of stored EAV entities: explode the map into
    * (field_key, field_value, field_type) plus typed casts —
    * `int_value` / `float_value` / `date_value` are non-null exactly
    * when the prefix says so and the value parses.
    */
  def eavExplode(stored: DataFrame, entitiesCol: String): DataFrame =
    stored
      .select(stored.columns.map(col) :+
        explode(col(entitiesCol)).as(Seq("field_key", "field_value")): _*)
      .withColumn("field_type", eavType(col("field_key")))
      .withColumn("int_value",
        when(col("field_type") === "integer",
          col("field_value").cast("long")).otherwise(lit(null).cast("long")))
      .withColumn("float_value",
        when(col("field_type") === "float",
          col("field_value").cast("double")).otherwise(lit(null).cast("double")))
      .withColumn("date_value",
        when(col("field_type") === "date",
          to_date(col("field_value"))).otherwise(lit(null).cast("date")))
      .drop(entitiesCol)

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

  /** Versioned save, O(delta): each call APPENDS a segment (no table
    * rewrite — the 100 TB-honest path) and version bookkeeping is
    * resolved AT READ by [[resolveVersions]]. Equivalent content to
    * eager [[SaveMode.Versioned]] (pinned by tests); the eager mode
    * remains as the copy-on-write analog for small dimensions.
    */
  def saveVersionedAppend(table: SnapshotTable, incoming: DataFrame,
                          keyCol: String, wave: Int): Unit =
    table.appendCommit(incoming.withColumn("save_wave", lit(wave)), wave)

  /** Resolve version_number / is_latest over the appended segments:
    * version = rank of the row's save_wave within its key (append
    * order), is_latest = last one. One window over (key), exactly the
    * read-side cost the eager mode paid at every write. Two appends of
    * one key in the SAME wave get a deterministic order via a stable
    * full-row hash tiebreaker (the eager mode resolved such ties at
    * write time; a window tie here would be partition-order-dependent).
    */
  def resolveVersions(table: SnapshotTable, keyCol: String): Option[DataFrame] =
    table.read().map { df =>
      val rowTie = xxhash64(to_json(struct(df.columns.sorted.map(col): _*)))
      val w = Window.partitionBy(keyCol).orderBy(col("save_wave").asc, rowTie.asc)
      val wAll = Window.partitionBy(keyCol)
      df.withColumn("version_number", row_number().over(w))
        .withColumn("is_latest",
          col("version_number") === max(col("version_number")).over(wAll))
        .drop("save_wave")
    }
}
