package graft.core

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Deterministic hashes shared by the crawl engine and the dedup
  * operators. All delegate to Spark's own implementations so values
  * computed here (driver/tests) agree bit-for-bit with the codegen'd
  * SQL functions (`xxhash64`, `md5`) used inside DataFrame plans.
  */
object Hashing {

  /** Same as Spark SQL `xxhash64(string)` (seed 42). */
  def xxhash64(s: String, seed: Long = 42L): Long = {
    val b = s.getBytes(UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }

  def xxhash64(b: Array[Byte]): Long =
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)

  /** Hex md5, same as Spark SQL / DuckDB `md5(string)`. */
  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes(UTF_8)).map(b => f"$b%02x").mkString
  }

  /** First 8 hex digits of md5 as a long — the JVM twin of
    * `TextAnalysis.portableHash` (Catalyst) and DuckDB's
    * `('0x' || substr(md5(s), 1, 8))::BIGINT`: the one 32-bit hash all
    * three engines can state identically.
    */
  def portableHash(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16)

  /** Content hash of a page row, mirroring the reference's rule of
    * md5 over the concatenation of the *sorted* stringified page
    * values (reference: crawler/connectors/htmlconnector.py:106-107).
    */
  def contentHash(values: Seq[String]): String =
    md5Hex(values.sorted.mkString(""))
}
