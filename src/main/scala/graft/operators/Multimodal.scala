package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Hashing

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in PARTITION-SIZED BATCHES
  * (the Scala analog of `mapInPandas` — one iterator pass per
  * partition, amortizing any per-batch setup such as a decoder
  * handle), never one-allocation-per-row driver loops.
  *
  * The decode kernels themselves are STUBS — this container ships no
  * image/audio codecs — marked [STUB] below and implemented as
  * deterministic functions of the bytes so the Spark-side contract
  * (schema, batching, partitioning, null handling) is real and
  * testable. Swapping in a real codec touches only the marked lines.
  */
object Multimodal {

  /** Typed metadata carried next to every media blob. */
  final case class MediaMeta(format: String, width: Int, height: Int,
                             durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String,
                            bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeature(media_id: Long, kind: String,
                                feature: Array[Float], frames: Int)

  /** [STUB] "decode" a media header from raw bytes: deterministic fake
    * that reads dimensions out of the first bytes. A real
    * implementation would call the codec here — same signature.
    */
  def decodeMeta(kind: String, bytes: Array[Byte]): MediaMeta = {
    val h = Hashing.xxhash64(bytes)
    MediaMeta(
      format = kind match {
        case "image" => "png"; case "audio" => "wav"; case _ => "mp4"
      },
      width = (math.floorMod(h, 1920L) + 1).toInt,
      height = (math.floorMod(h >>> 16, 1080L) + 1).toInt,
      durationMs = if (kind == "image") 0L else math.floorMod(h >>> 32, 600000L))
  }

  /** [STUB] feature extraction: a deterministic `dim`-float vector from
    * the bytes (stands in for an encoder forward pass).
    */
  def extractFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
    val base = Hashing.xxhash64(bytes)
    Array.tabulate(dim) { i =>
      ((Hashing.xxhash64(s"$base:$i") >>> 11).toDouble / (1L << 53).toDouble)
        .toFloat - 0.5f
    }
  }

  /** [STUB] frame sampling for video bytes: deterministic slice points.
    * Returns the number of frames a real decoder would have produced.
    */
  def sampleFrames(bytes: Array[Byte], everyMs: Long, durationMs: Long): Int =
    if (durationMs <= 0) 1 else math.max(1, (durationMs / math.max(everyMs, 1L)).toInt)

  // ---- SQL-portable stub twin (round-3 item #5) ----
  // Same plumbing, but every derived stub quantity is a
  // graft.core.Hashing.portableHash over the bytes' lowercase hex — so
  // a DuckDB oracle can regenerate the bytes AS HEX TEXT (pure string
  // md5 concatenation, no binary functions needed) and recompute the
  // features, making q_media_features a three-green oracle row.

  private def hexLower(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  /** [STUB] portable decode: identical contract to [[decodeMeta]], all
    * fields md5-derived from the bytes' hex. A real codec swaps in at
    * the same seam.
    */
  def decodeMetaPortable(kind: String, bytes: Array[Byte]): MediaMeta = {
    val hex = hexLower(bytes)
    MediaMeta(
      format = kind match {
        case "image" => "png"; case "audio" => "wav"; case _ => "mp4"
      },
      width = (Hashing.portableHash(s"w:$hex") % 1920L + 1).toInt,
      height = (Hashing.portableHash(s"h:$hex") % 1080L + 1).toInt,
      durationMs =
        if (kind == "image") 0L else Hashing.portableHash(s"dur:$hex") % 600000L)
  }

  /** Attach decoded metadata to a media DataFrame (media_id, kind,
    * bytes). Batched per partition; the decode is invoked exactly once
    * per row inside the partition iterator.
    */
  def withMeta(spark: SparkSession, media: DataFrame,
               decode: (String, Array[Byte]) => MediaMeta = decodeMeta)
      : Dataset[MediaRow] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would open the codec ONCE here [STUB]
        it.map { case (id, kind, bytes) =>
          MediaRow(id, kind, bytes, decode(kind, bytes))
        }
      }
  }

  /** Full feature pipeline: decode → (video) frame-sample → feature
    * vector. Output is ANN-ready (feeds [[Similarity]] directly).
    */
  def features(spark: SparkSession, media: DataFrame, dim: Int = 32,
               frameEveryMs: Long = 1000L,
               decode: (String, Array[Byte]) => MediaMeta = decodeMeta)
      : Dataset[MediaFeature] = {
    import spark.implicits._
    withMeta(spark, media, decode).mapPartitions { it =>
      it.map { row =>
        val frames =
          if (row.kind == "video")
            sampleFrames(row.bytes, frameEveryMs, row.meta.durationMs)
          else 1
        MediaFeature(row.media_id, row.kind, extractFeature(row.bytes, dim), frames)
      }
    }
  }

  /** SQL-portable deterministic synthetic media: bytes = md5-chunk
    * noise (`md5("b:id:k")` concatenated, truncated to the row's
    * length), so an oracle regenerates the identical byte stream as a
    * hex STRING with nothing but md5 + string ops. Pairs with
    * [[decodeMetaPortable]].
    */
  def syntheticMediaPortable(spark: SparkSession, n: Long,
                             partitions: Int = 4): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = (64L + Hashing.portableHash(s"len:$i") % 192L).toInt
      val hex = (0 until (len * 2 + 31) / 32)
        .map(k => Hashing.md5Hex(s"b:$i:$k")).mkString.substring(0, len * 2)
      val bytes = Array.tabulate(len)(j =>
        Integer.parseInt(hex.substring(j * 2, j * 2 + 2), 16).toByte)
      (i, kind, bytes)
    }.toDF("media_id", "kind", "bytes")
  }

  /** Deterministic synthetic media table for tests/bench (no codecs in
    * the container ⇒ bytes are seeded noise with the right shape).
    */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int = 4): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 64 + (Hashing.xxhash64(s"len:$i").abs % 192).toInt
      val bytes = Array.tabulate(len)(j => Hashing.xxhash64(s"b:$i:$j").toByte)
      (i, kind, bytes)
    }.toDF("media_id", "kind", "bytes")
  }
}
