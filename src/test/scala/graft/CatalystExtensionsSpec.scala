package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.UrlNormalizer
import graft.operators.BloomSketchAgg
import graft.plans.{CanonicalizeUrl, GraftExtensions}

/** The custom Catalyst surface: native expression (interpreted +
  * codegen + SQL registration) and the typed Bloom aggregator.
  */
class CatalystExtensionsSpec extends AnyFunSuite {

  // NOTE: suites share one SparkContext; withExtensions only applies
  // to a freshly-created session, so register imperatively (same
  // builder the extensions class injects).
  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-catalyst-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    CanonicalizeUrl.register(s)
    s
  }
  import spark.implicits._

  private val messy = Seq(
    "HTTP://News.Example.COM.:80/a/./b/../x.html?utm_source=t&q=1#frag",
    "http://plain.com/ok",
    "javascript:void(0)")

  test("native expression matches the core function (codegen path)") {
    val got = messy.toDF("url")
      .select(CanonicalizeUrl.canonicalize_url($"url").as("c"))
      .collect().map(r => Option(r.getString(0)))
    val want = messy.map(u => UrlNormalizer.canonicalize(u))
    assert(got.toSeq === want)
  }

  test("expression is registered for SQL via extensions") {
    messy.toDF("url").createOrReplaceTempView("messy_urls")
    val got = spark.sql(
      "SELECT canonicalize_url(url) AS c FROM messy_urls").collect()
      .map(r => Option(r.getString(0))).toSeq
    assert(got === messy.map(UrlNormalizer.canonicalize(_)))
  }

  test("expression stays inside whole-stage codegen") {
    // needs a real scan — a local Seq gets folded into a LocalTableScan
    // by ConvertToLocalRelation before codegen even runs
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(CanonicalizeUrl.canonicalize_url(
        concat(lit("http://"), $"source", lit(".test/p/"), $"doc_id")).as("c"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      df.queryExecution.executedPlan.toString)
  }

  test("BloomSketchAgg builds a mergeable sketch with no false negatives") {
    val keys = (0L until 5000L).map(i => i * 2654435761L)
    val agg = new BloomSketchAgg(expectedItems = 5000, fpp = 0.01)
    val bytes = keys.toDF("k").repartition(4).as[Long]
      .select(udaf(agg).apply($"k")).as[Array[Byte]].head()
    val bf = BloomSketchAgg.deserialize(bytes)
    keys.foreach(k => assert(bf.mightContainLong(k)))
    val falsePos = (0L until 10000L).map(i => i * 7919L + 3L)
      .count(k => !keys.contains(k) && bf.mightContainLong(k))
    assert(falsePos < 500) // ~1% fpp with margin
  }
}
