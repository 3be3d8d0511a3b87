package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SessionInfo

/** Mirrors the reference session-info truth tables
  * (crawler/utils/sessioninfomanager.py:13-19,56-90,105-120): path-tuple
  * keys, update-mode semantics, hash-gated `updated`, delete
  * short-circuit, and the re-crawl subtree skip.
  */
class SessionInfoSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sessioninfo-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // previous crawl: post a with reviews a/b (hash hb) and a/c (deleted)
  private def state = Seq(
    (Seq("a"), "Post", "ha", false),
    (Seq("a", "b"), "Review", "hb", false),
    (Seq("a", "c"), "Review", "hc", true),
    (Seq("a", "c", "x"), "Comment", "hx", true))
    .toDF("path", "entity", "hash", "deleted")

  test("check: truth table (exists × update × deleted)") {
    val incoming = Seq(
      (Seq("a"), "Post", "ha"), // exists
      (Seq("a", "b"), "Review", "hb2"), // exists, changed hash
      (Seq("a", "d"), "Review", "hd"), // new
      (Seq("a", "c"), "Review", "hc2")) // deleted
      .toDF("path", "entity", "hash")

    def skips(update: Boolean): Map[String, Boolean] =
      SessionInfo.check(state, incoming, update)
        .select(concat_ws("/", col("path")), col("skip"))
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap

    // update=false: exists ⇒ skip; deleted ⇒ skip; new ⇒ process
    assert(skips(update = false) ===
      Map("a" -> true, "a/b" -> true, "a/d" -> false, "a/c" -> true))
    // update=true: everything processes EXCEPT deleted paths
    assert(skips(update = true) ===
      Map("a" -> false, "a/b" -> false, "a/d" -> false, "a/c" -> true))
  }

  test("updateFlags: new and changed paths are updated, unchanged are not") {
    val results = Seq(
      (Seq("a"), "Post", "ha"), // unchanged hash
      (Seq("a", "b"), "Review", "HB"), // changed hash
      (Seq("a", "d"), "Review", "hd")) // new
      .toDF("path", "entity", "hash")
    val flags = SessionInfo.updateFlags(state, results)
      .select(concat_ws("/", col("path")), col("updated"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(flags === Map("a" -> false, "a/b" -> true, "a/d" -> true))
  }

  test("merge: refresh + insert, deleted rows stay deleted and are not revived") {
    val results = Seq(
      (Seq("a", "b"), "Review", "HB"),
      (Seq("a", "c"), "Review", "HC"), // deleted in state — must NOT revive
      (Seq("a", "d"), "Review", "hd"))
      .toDF("path", "entity", "hash")
    val merged = SessionInfo.merge(state, results)
      .select(concat_ws("/", col("path")), col("hash"), col("deleted"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(merged === Set(
      ("a", "ha", false),
      ("a/b", "HB", false), // refreshed
      ("a/c", "hc", true), // deleted row untouched
      ("a/c/x", "hx", true),
      ("a/d", "hd", false))) // inserted
  }

  test("markDeleted: a prefix and its whole subtree flip to deleted") {
    val st = Seq(
      (Seq("a"), "Post", "ha", false),
      (Seq("a", "b"), "Review", "hb", false),
      (Seq("a", "b", "z"), "Comment", "hz", false),
      (Seq("ab"), "Post", "q", false)) // sibling that shares a string prefix
      .toDF("path", "entity", "hash", "deleted")
    val marked = SessionInfo.markDeleted(st, Seq("a", "b"))
      .select(concat_ws("/", col("path")), col("deleted"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(marked === Map("a" -> false, "a/b" -> true, "a/b/z" -> true, "ab" -> false))
  }

  test("re-crawl subtree skip: unchanged parents prune their descendants") {
    // second crawl of the tree: parent a unchanged ⇒ its subtree rows
    // never even reach check/update (the connector stops descending)
    val incoming = Seq(
      (Seq("a"), "Post", "ha"),
      (Seq("a", "b"), "Review", "hb"),
      (Seq("a", "b", "z"), "Comment", "hz"),
      (Seq("q"), "Post", "hq"),
      (Seq("q", "r"), "Review", "hr"))
      .toDF("path", "entity", "hash")
    val checked = SessionInfo.check(state, incoming, updateMode = false)
    val skipped = checked.filter(col("skip")).select("path", "entity", "hash")
    val surviving = SessionInfo.pruneSubtrees(
      checked.filter(!col("skip")).select("path", "entity", "hash"), skipped)
      .select(concat_ws("/", col("path")))
      .collect().map(_.getString(0)).toSet
    // a and a/b exist ⇒ skipped; a/b/z pruned UNDER them without a
    // check of its own (the short-circuit); q and q/r are new
    assert(surviving === Set("q", "q/r"))
    val skippedKeys = skipped.select(concat_ws("/", col("path")))
      .collect().map(_.getString(0)).toSet
    assert(skippedKeys === Set("a", "a/b"))
  }

  test("subtree-skip counts on a deterministic two-crawl tree") {
    // crawl 1 state: 3 posts × 4 reviews × 2 comments
    val tree = for {
      p <- 0 until 3; r <- 0 until 4; lvl <- Seq(1, 2, 3)
      c <- if (lvl == 3) 0 until 2 else Seq(0)
    } yield lvl match {
      case 1 => (Seq(s"p$p"), "Post", s"hp$p")
      case 2 => (Seq(s"p$p", s"r$r"), "Review", s"hr$p$r")
      case _ => (Seq(s"p$p", s"r$r", s"c$c"), "Comment", s"hc$p$r$c")
    }
    val st = tree.distinct.toDF("path", "entity", "hash")
      .withColumn("deleted", lit(false))
    // crawl 2 input: identical tree (nothing changed anywhere)
    val incoming = tree.distinct.toDF("path", "entity", "hash")
    val checked = SessionInfo.check(st, incoming, updateMode = false)
    val skippedNow = checked.filter(col("skip"))
    val descendantsPruned = SessionInfo.pruneSubtrees(
      checked.filter(!col("skip")).select("path", "entity", "hash"),
      skippedNow.select("path", "entity", "hash"))
    // every row is known ⇒ everything skips at check, nothing survives
    assert(skippedNow.count() === tree.distinct.size)
    assert(descendantsPruned.count() === 0)

    // now ONE review changes hash in update mode: only it and its own
    // subtree re-process; unchanged SIBLING subtrees prune away
    val changed = incoming.withColumn("hash",
      when(concat_ws("/", col("path")) === "p0/r0", lit("CHANGED"))
        .otherwise(col("hash")))
    val flags = SessionInfo.updateFlags(st, changed)
    // amazon-style short-circuit (amazonconnector.py:163-165): an
    // unchanged REVIEW prunes its comment subtree from re-processing
    val unchangedReviews = flags
      .filter(!col("updated") && col("entity") === "Review")
      .select("path", "entity", "hash")
    val reprocess = SessionInfo.pruneSubtrees(
      flags.filter(col("updated")).select("path", "entity", "hash"),
      unchangedReviews)
    val keys = reprocess.select(concat_ws("/", col("path")))
      .collect().map(_.getString(0)).toSet
    assert(keys === Set("p0/r0"), s"only the changed review re-processes: $keys")
  }
}
