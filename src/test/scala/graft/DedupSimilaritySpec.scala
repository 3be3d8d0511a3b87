package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Similarity}

/** Dedup family + similarity search + multimodal plumbing: planted
  * duplicates must be found, unrelated content must not be, LSH recall
  * is bounded against the exact baseline.
  */
class DedupSimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** Docs share a small common preamble but are mostly unique content
    * (hash-derived words), so only the PLANTED duplicates are near-dups.
    */
  private def base(i: Int) = {
    val unique = (0 until 18).map { j =>
      "w" + math.floorMod(graft.core.Hashing.xxhash64(s"$i:$j"), 100000L)
    }.mkString(" ")
    s"document number $i about spark pipelines $unique end of section $i"
  }

  private lazy val docs = {
    val rows =
      (0 until 40).map(i => (i.toLong, base(i))) ++ Seq(
        (100L, base(7)), // exact dup of 7
        (101L, base(9) + " tiny suffix change"), // near dup of 9
        (102L, "completely different short text"))
    rows.toDF("doc_id", "text")
  }

  test("contamination flags verbatim k-gram overlap with the benchmark, not paraphrase") {
    import graft.operators.Dedup
    val bench = Seq(
      100L -> "the quick brown fox jumps over the lazy dog tonight again").toDF("doc_id", "text")
    val corpus = Seq(
      // contains the benchmark's 8-gram verbatim -> contaminated
      1L -> "prefix words the quick brown fox jumps over the lazy dog tonight again suffix",
      // same vocabulary, different order -> clean
      2L -> "dog lazy the over jumps fox brown quick the again tonight",
      // unrelated -> clean
      3L -> "completely different content with no overlap at all whatsoever here",
      // benchmark doc itself present in the corpus -> self, not flagged
      100L -> "the quick brown fox jumps over the lazy dog tonight again")
      .toDF("doc_id", "text")
    val hits = Dedup.contamination(corpus, bench, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hits.keySet === Set(1L))
    assert(hits(1L)._1 >= 1L && hits(1L)._2 === 1L)
  }

  test("contaminationFraction: exact milli overlap, threshold verdict, sub-k drop") {
    import graft.operators.Dedup
    val bench = Seq(
      100L -> "the quick brown fox jumps over the lazy dog").toDF("doc_id", "text")
    val corpus = Seq(
      // 10 tokens -> 3 distinct 8-grams, 1 of them is the bench's
      //   first 8-gram -> 333 milli, below the 500 threshold
      1L -> "the quick brown fox jumps over the lazy cat meow",
      // the bench doc verbatim: 2 grams, both shared -> 1000, flagged
      2L -> "the quick brown fox jumps over the lazy dog",
      // unrelated 8 tokens -> 1 gram, 0 shared -> 0
      3L -> "completely different content with no overlap at all",
      // 7 tokens: below k, must not be emitted
      4L -> "too short to have any eight grams").toDF("doc_id", "text")
    val out = Dedup.contaminationFraction(corpus, bench, "doc_id", "text",
        k = 8, thresholdMilli = 500L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) === ((3L, 1L, 333L, false)))
    assert(out(2L) === ((2L, 2L, 1000L, true)))
    assert(out(3L) === ((1L, 0L, 0L, false)))
  }

  test("exact dedup keeps the min id of each duplicate group") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(7L) && !kept.contains(100L))
    assert(kept.contains(101L) && kept.contains(102L))
    assert(kept.size === docs.count() - 1)
  }

  test("minhash pairs find exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleK = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((7L, 100L)), s"missing exact dup pair in $pairs")
    assert(pairs.contains((9L, 101L)), s"missing near dup pair in $pairs")
    assert(!pairs.exists(p => p._1 == 102L || p._2 == 102L))
  }

  test("minhash dedup removes the higher-id duplicate") {
    val kept = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(100L) && !kept.contains(101L))
    assert(kept.contains(7L) && kept.contains(9L) && kept.contains(102L))
  }

  test("portable minhash pairs find planted dups, not unrelated docs") {
    val pairs = Dedup.minhashPairsPortable(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((7L, 100L)), "exact dup must pair")
    assert(pairs.contains((9L, 101L)), "near dup must pair")
    assert(!pairs.exists(p => p._1 == 102L || p._2 == 102L),
      "unrelated doc must not pair")
  }

  test("minhash signature kernel == relational statement on varied inputs") {
    // the round-6 generated kernel (plans.MinhashSig) must reproduce
    // the posexplode+window+min-aggregate statement signature-for-
    // signature, including the sub-k whole-doc gram, empty docs (one
    // "" shingle), unicode bytes, and null-text doc exclusion
    val adversarial = Seq(
      (200L, ""), (201L, "one"), (202L, "one two"), (203L, "one two three"),
      (204L, "Tab\tand\nnewline   spaced"), (205L, "ümlaut tökens über straße"),
      (206L, "punct!!!only???"), (207L, null.asInstanceOf[String]),
      (208L, "a a a a a"), (209L, "😀 emoji 😀 tokens"))
      .toDF("doc_id", "text")
    val both = docs.unionByName(adversarial)
    val kernel = both.select(col("doc_id").as("doc_id_"),
        graft.plans.MinhashSig.minhash_sig(
          split(lower(col("text")), "\\W+"), lit(3), lit(24)).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val relational = Dedup.minhashSigsRelational(both, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(kernel.keySet === relational.keySet)
    assert(!kernel.keySet.contains(207L)) // null text excluded by both
    kernel.foreach { case (id, sig) =>
      assert(sig === relational(id), s"signature mismatch for doc $id")
    }
  }

  test("gram-key kernel == relational statement (both tokenizers, both fallbacks)") {
    // plans.GramKeys must reproduce the posexplode+window+distinct
    // statement's (doc, gk) set for the tokenGramKeys config (k=8,
    // [^a-z0-9_]+, sub-k docs excluded) AND the ngramContainment
    // config (k=3, \W+, whole-doc fallback)
    val adversarial = Seq(
      (300L, ""), (301L, "just two"), (302L, "repeat repeat repeat repeat " +
        "repeat repeat repeat repeat repeat repeat"),
      (303L, null.asInstanceOf[String]), (304L, "ümlaut tökens über straße " +
        "mixed UPPER case words here and more of them too"),
      (305L, "exactly eight tokens in this very sentence here"))
      .toDF("doc_id", "text")
    val both = docs.unionByName(adversarial)
    for ((k, pat, fb) <- Seq((8, "[^a-z0-9_]+", false), (3, "\\W+", true))) {
      val kernel = both.select(col("doc_id").as("doc_id_"),
          explode(graft.plans.GramKeys.gram_keys(
            split(lower(col("text")), pat), lit(k), lit(fb))).as("gk"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val relational = Dedup.gramKeysRelational(both, "doc_id", "text", k, pat, fb)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(kernel === relational, s"k=$k pattern=$pat fallback=$fb")
      // per-row arrays must also be duplicate-free (the distinct claim)
      val sizes = both.select(col("doc_id"),
          graft.plans.GramKeys.gram_keys(
            split(lower(col("text")), pat), lit(k), lit(fb)).as("gs"))
        .filter(col("gs").isNotNull)
        .select(col("doc_id"), size(col("gs")).as("n"),
          size(array_distinct(col("gs"))).as("nd")).collect()
      sizes.foreach(r => assert(r.getInt(1) === r.getInt(2), s"dup in row $r"))
    }
  }

  test("portable simhash kernel == relational vote aggregate") {
    val adversarial = Seq(
      (400L, ""), (401L, "one"), (402L, null.asInstanceOf[String]),
      (403L, "ümlaut tökens über straße"), (404L, "a a b b balanced votes"),
      (405L, "punct!!!only???"))
      .toDF("doc_id", "text")
    val both = docs.unionByName(adversarial)
    val kernel = both.select(col("doc_id").as("doc_id_"),
        graft.plans.PortableSimhash.portable_simhash(
          split(lower(col("text")), "\\W+"), lit(32)).as("sketch"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val relational = Dedup.portableSketchesRelational(both, "doc_id", "text", 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel === relational)
    assert(kernel(400L) === 0L && kernel(402L) === 0L) // token-less -> 0
  }

  test("winnow-stats kernel == relational two-window statement") {
    import graft.functions.TextAnalysis
    val adversarial = Seq(
      (500L, ""), (501L, "four tokens too few"), (502L, "exactly five tokens " +
        "right here"), (503L, null.asInstanceOf[String]),
      (504L, ("many tokens " * 40).trim), (505L, "ümlaut tökens über straße " +
        "and some more filler words to cross the gram floor"))
      .toDF("doc_id", "text")
    val both = docs.unionByName(adversarial)
    val kernel = TextAnalysis.winnowFingerprintsTokens(both, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    val relational = TextAnalysis
      .winnowFingerprintsTokensRelational(both, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(kernel === relational)
    assert(!kernel.keySet.contains(503L)) // null text excluded by both
  }

  test("span-scrub kernel path == relational statement") {
    // the GramKeySeq + SpanCoverage pipeline must reproduce the
    // window-based statement row-for-row: same flags, same span runs,
    // same kept-text hash — including overlap merges, doc-boundary
    // clipping, sub-k docs, empty and null text
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val rows = Seq(
      (600L, s"intro words $shared middle passage $shared outro close here"),
      (601L, s"$shared completely other tail content of this document"),
      (602L, "unique content nothing shared with any other document at all"),
      (603L, ""), (604L, null.asInstanceOf[String]), (605L, "short doc"),
      (606L, s"$shared"), (607L, s"prefix $shared"))
      .toDF("doc_id", "text")
    val kernel = Dedup.duplicateSpanScrub(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val relational = Dedup.duplicateSpanScrubRelational(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(kernel === relational)
    assert(kernel(602L)._2 === 0L) // unique doc keeps everything
    assert(kernel(600L)._2 >= 1L) // shared block flagged
  }

  test("mega-bucket stress: the cap bounds pairs and is LOUD (both LSH variants)") {
    // 2000 byte-identical docs — the viral-boilerplate shape: every
    // doc lands in the SAME bucket of every band. Uncapped this is
    // C(2000,2) ≈ 2M candidate pairs; capped at 50 it must be exactly
    // C(50,2) = 1225 distinct pairs (lowest 50 ids kept per band, the
    // same 50 in every band), and the cap must report itself.
    import org.apache.spark.sql.Observation
    val viral = (0 until 2000).map(i =>
      (i.toLong, "identical viral boilerplate text repeated across the corpus"))
      .toDF("doc_id", "text")
    val obsP = Observation("cap-portable")
    val pairsP = Dedup.minhashPairsPortable(viral, "doc_id", "text",
      shingleK = 3, numHashes = 24, bands = 8, threshold = 0.5,
      maxBucket = 50, capMetrics = Some(obsP))
    assert(pairsP.count() === 1225L)
    assert(obsP.get("capped_buckets") === 8L,
      "one overflowing bucket per band must be counted")
    assert(obsP.get("rows_dropped_by_cap") === 8L * 1950L)
    val obsX = Observation("cap-xxhash")
    val pairsX = Dedup.minhashPairs(viral, "doc_id", "text",
      shingleK = 3, numHashes = 64, bands = 16, threshold = 0.5,
      maxBucket = 50, capMetrics = Some(obsX))
    assert(pairsX.count() === 1225L)
    assert(obsX.get("capped_buckets") === 16L)
    assert(obsX.get("rows_dropped_by_cap") === 16L * 1950L)
    // an uncapped-regime run on the REGULAR fixture reports zero:
    // the metric is attached (loud) even when nothing is capped
    val obs0 = Observation("cap-none")
    Dedup.minhashPairsPortable(docs, "doc_id", "text", threshold = 0.5,
      capMetrics = Some(obs0)).count()
    assert(obs0.get("capped_buckets") === 0L)
    assert(obs0.get("rows_dropped_by_cap") === 0L)
  }

  test("connectedMinLabels: chains flood to the component min, fixpoint") {
    // components: {1,2,9} (chain 2-9, 9-1), {4,5}, singleton {7}
    val vertices = Seq(1L, 2L, 4L, 5L, 7L, 9L).toDF("v")
    val pairs = Seq((2L, 9L), (1L, 9L), (4L, 5L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedMinLabels(vertices, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 9L -> 1L, 4L -> 4L, 5L -> 4L, 7L -> 7L))
    // fixpoint: re-running on the already-labeled graph changes nothing
    val again = Dedup.connectedMinLabels(vertices, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === labels)
  }

  test("connectedMinLabels: pointer halving converges a 1000-chain in O(log n)") {
    // a 1000-vertex path graph has diameter 999 — plain one-hop
    // propagation needs ~999 rounds; pointer halving must do it in
    // ~log2(1000) ≈ 10 (bound 12, the round-2 verdict's criterion)
    val n = 1000L
    val vertices = spark.range(0, n).toDF("v")
    val pairs = spark.range(0, n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val labels = Dedup.connectedMinLabels(vertices, pairs, maxIterations = 12)
    assert(labels.filter(col("label") =!= 0L).isEmpty,
      "every chain vertex must flood to the component min (0)")
  }

  test("reliableCheckpoints without a checkpoint dir fails loudly (all operators)") {
    // ONE dedicated, order-independent home for the loud-require
    // contract: the checkpoint dir is JVM-global (one SparkContext
    // across suites), so this test CLEARS it (setCheckpointDir(null)
    // → Option(null) = None in local mode), asserts every reliable
    // path refuses, and restores whatever was set before.
    val prev = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(null)
    try {
      assert(spark.sparkContext.getCheckpointDir.isEmpty,
        "precondition: dir must be cleared for the intercepts below")
      val vertices = Seq(1L, 2L).toDF("v")
      val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
      intercept[IllegalArgumentException] {
        Dedup.connectedMinLabels(vertices, pairs, reliableCheckpoints = true)
      }
      intercept[IllegalArgumentException] {
        graft.operators.LinkGraph.pageRank(vertices,
          Seq((1L, 2L)).toDF("src", "dst"), 1, reliableCheckpoints = true)
      }
      intercept[IllegalArgumentException] {
        Similarity.semDedup(spark,
          Seq((1L, Array(1.0f, 0.0f))).toDF("id", "vec"),
          k = 1, iterations = 1, tau = 0.9, reliableCheckpoints = true)
      }
    } finally prev.foreach(spark.sparkContext.setCheckpointDir)
  }

  private def ensureCheckpointDir(): Unit =
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-ckpt-").toString)

  test("connectedMinLabels: reliable-checkpoint path matches localCheckpoint") {
    // the cluster seam (round-3 verdict #8): checkpoint() to the
    // context's checkpoint dir instead of executor-local blocks —
    // identical labels (the loud-require contract has its own
    // dedicated test above)
    val vertices = Seq(1L, 2L, 4L, 5L, 7L, 9L).toDF("v")
    val pairs = Seq((2L, 9L), (1L, 9L), (4L, 5L)).toDF("id_a", "id_b")
    ensureCheckpointDir()
    val reliable = Dedup.connectedMinLabels(vertices, pairs,
        reliableCheckpoints = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable ===
      Map(1L -> 1L, 2L -> 1L, 9L -> 1L, 4L -> 4L, 5L -> 4L, 7L -> 7L))
  }

  test("semDedup: reliable-checkpoint materialization matches the default path") {
    // round-4 verdict #6: the assignment-table pin is an explicit
    // choice mirroring connectedMinLabels, not a silent localCheckpoint
    val rows = (0 until 12).map(i =>
      (i.toLong, Array.tabulate(6)(j => if (j == i % 3) 1.0f else 0.05f * j)))
    val df = rows.toDF("id", "vec")
    ensureCheckpointDir()
    def run(reliable: Boolean) =
      Similarity.semDedup(spark, df, k = 3, iterations = 2, tau = 0.999,
          reliableCheckpoints = reliable)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(run(reliable = true) === run(reliable = false))
  }

  test("dup clusters: planted dups share a cluster, everything else is a singleton") {
    val out = graft.queries.QueryCatalog.qDupClustersOn(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(100L) === 7L && out(7L) === 7L, "exact dup joins its original")
    assert(out(101L) === out(9L), "near dup clusters with its original")
    val planted = Set(7L, 9L, 100L, 101L)
    out.filterNot { case (id, _) => planted(id) }.foreach { case (id, c) =>
      assert(c === id, s"doc $id must be a singleton cluster")
    }
  }

  test("transitive dedup keeps one doc per component (subset of one-pass)") {
    val kept = Dedup.minhashDedupTransitive(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val onePass = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(onePass),
      s"transitive survivors must be a subset: ${kept -- onePass}")
    assert(kept.contains(7L) && !kept.contains(100L)) // dup group collapses
    assert(kept.contains(102L)) // singleton survives
  }

  test("simhash pairs find the near dup within hamming distance") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((7L, 100L)))
    assert(pairs.contains((9L, 101L)))
  }

  test("ngram jaccard: identical = 1.0, disjoint = 0.0") {
    val pairs = Seq((7L, 100L), (7L, 102L)).toDF("id_a", "id_b")
    val got = Dedup.ngramJaccard(pairs, docs, "doc_id", "text", k = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((7L, 100L)) === 1.0)
    assert(got((7L, 102L)) === 0.0)
  }

  // ---- similarity ----

  private def clusteredVecs(n: Int, dim: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val cluster = i % 5
      val v = Array.tabulate(dim) { j =>
        val centroid = if (j % 5 == cluster) 1.0f else 0.0f
        val noise = ((graft.core.Hashing.xxhash64(s"n:$i:$j") >>> 11).toDouble /
          (1L << 53).toDouble).toFloat * 0.4f
        centroid + noise
      }
      (i.toLong, v)
    }

  test("cosineTopK: identical vector ranks first") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.01f, 0.0f)), // near-identical to 1
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f))).toDF("id", "vec")
    val top = Similarity.cosineTopK(vecs.filter(col("id") === 1), vecs, k = 2)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("neighbor_id") === 2L)
    assert(top(0).getAs[Double]("cosine") > 0.99)
  }

  test("lshTopK recall >= 0.6 vs brute force on clustered vectors") {
    val vecs = clusteredVecs(200, 20).toDF("id", "vec")
    val queries = vecs.filter(col("id") < 20)
    val exact = Similarity.cosineTopK(queries, vecs, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(queries, vecs, k = 5, dim = 20,
        bits = 8, tables = 6)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall $recall too low")
  }

  test("portable-LSH topK recall >= 0.6 vs brute force") {
    val vecs = clusteredVecs(200, 20).toDF("id", "vec")
    val queries = vecs.filter(col("id") < 20)
    val exact = Similarity.cosineTopK(queries, vecs, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopKPortable(queries, vecs, k = 5,
        dim = 20, bits = 8, tables = 6)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"portable LSH recall $recall too low")
  }

  test("cosineDupPairs finds planted near-identical vectors") {
    val base = Array.tabulate(16)(j => (j % 3).toFloat + 0.1f)
    val twin = base.clone(); twin(0) += 0.01f
    val vecs = (clusteredVecs(50, 16) ++ Seq((900L, base), (901L, twin)))
      .toDF("id", "vec")
    val pairs = Similarity.cosineDupPairs(vecs, threshold = 0.999, dim = 16,
        bits = 8, tables = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((900L, 901L)))
  }

  test("IVF ANN: deterministic training, recall >= 0.6 vs brute force") {
    import graft.operators.IvfIndex
    val vecs = clusteredVecs(300, 20).toDF("id", "vec")
    val model1 = IvfIndex.train(spark, vecs, k = 10, iterations = 2)
    val model2 = IvfIndex.train(spark, vecs, k = 10, iterations = 2)
    assert(model1.centroids.map(_.toSeq).toSeq === model2.centroids.map(_.toSeq).toSeq,
      "training must be deterministic")
    val assigned = IvfIndex.assign(vecs, model1)
    val queries = vecs.filter(col("id") < 20)
    val exact = Similarity.cosineTopK(queries, vecs, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = IvfIndex.topK(queries, assigned, model1, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall too low")
  }

  // ---- multimodal plumbing ----

  test("media features: schema, determinism, frame sampling") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val f1 = Multimodal.features(spark, media, dim = 8).collect()
      .map(f => (f.media_id, f.feature.toSeq, f.frames)).sortBy(_._1)
    val f2 = Multimodal.features(spark, media.repartition(7), dim = 8).collect()
      .map(f => (f.media_id, f.feature.toSeq, f.frames)).sortBy(_._1)
    assert(f1.toSeq === f2.toSeq) // deterministic under repartition
    assert(f1.forall(_._2.size === 8))
    val byKind = Multimodal.features(spark, media, dim = 8).collect()
      .groupBy(_.kind).view.mapValues(_.map(_.frames).max).toMap
    assert(byKind("image") === 1)
    assert(byKind("video") >= 1)
  }

  test("paragraph dedup: first occurrence survives, short lines bypass, counts add up") {
    val footer = "shared footer paragraph long enough to clear the dedup length floor easily"
    val longA = "a genuinely substantial paragraph of original prose content number one here"
    val longB = "another genuinely substantial paragraph of original prose content two here"
    val rows = Seq(
      (1L, s"$longA\nok\n$footer"),            // first: keeps everything
      (2L, s"$longB\nok\n$footer"),            // footer dropped (doc 1 owns it)
      (3L, s"$footer\nok\n$longA"),            // both long paras are repeats
      (4L, s"$longA\n$longA"),                 // within-doc repeat: pos 0 kept
      (5L, "ok\nok\nok"))                      // short lines: never deduped
    val out = Dedup.paragraphDedup(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L) === ((3L, 0L, h(s"$longA\nok\n$footer"))))
    assert(out(2L) === ((3L, 1L, h(s"$longB\nok"))))
    assert(out(3L) === ((3L, 2L, h("ok"))))
    // longA globally first occurs in doc 1, so BOTH of doc 4's copies drop
    assert(out(4L) === ((2L, 2L, h(""))))
    assert(out(5L) === ((3L, 0L, h("ok\nok\nok"))))
  }

  test("line-frequency dedup: only over-threshold lines drop, ALL their copies") {
    val viral = "this viral boilerplate line appears in three documents here"
    val rare = "this rare line appears in just two documents which is fine"
    val rows = Seq(
      (1L, s"$viral\nunique prose line number one long enough to be eligible\n$rare"),
      (2L, s"$viral\n$rare"),
      (3L, s"$viral\nshort"),
      (4L, s"$viral\n$viral")) // two copies in ONE doc: docf counts docs, not rows
    val out = Dedup.lineFrequencyDedup(rows.toDF("doc_id", "text"),
        "doc_id", "text", maxDf = 3, minLen = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // viral is in 4 docs (>= 3): dropped EVERYWHERE (no survivor, unlike
    // paragraphDedup's keep-first). rare is in 2 docs (< 3): kept.
    assert(out(1L) === ((3L, 1L,
      h(s"unique prose line number one long enough to be eligible\n$rare"))))
    assert(out(2L) === ((2L, 1L, h(rare))))
    assert(out(3L) === ((2L, 1L, h("short")))) // short line bypasses counting
    assert(out(4L) === ((2L, 2L, h(""))))      // both in-doc copies drop
  }

  test("duplicate-span scrub: shared spans merge and drop, unique text survives") {
    // k=3 grams; shared 5-token span "a b c d e" -> 3 shared grams that
    // must MERGE into one covered span of 5 tokens in every carrier.
    val rows = Seq(
      (0L, "a b c d e f g"),                      // span at head
      (1L, "x a b c d e y"),                      // same span mid-doc
      (2L, "p1 q1 r1 s1 t1 u1"),                  // fully unique
      (3L, "a b"),                                // < k tokens: no grams
      (4L, "m m m m"),                            // in-doc repeat, docf=1
      (5L, "a b c d e f1 f2 f3 p q r s t"),       // TWO disjoint shared spans
      (6L, "a b c d e g1 g2 g3 p q r s t"))
    val out = Dedup.duplicateSpanScrub(rows.toDF("doc_id", "text"),
        "doc_id", "text", k = 3, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0L) === ((7L, 1L, 5L, h("f g"))))
    assert(out(1L) === ((7L, 1L, 5L, h("x y"))))
    assert(out(2L) === ((6L, 0L, 0L, h("p1 q1 r1 s1 t1 u1"))))
    assert(out(3L) === ((2L, 0L, 0L, h("a b"))))   // sub-k doc kept whole
    // 'm m m' repeats only WITHIN doc 4: document frequency is 1 -> kept
    assert(out(4L) === ((4L, 0L, 0L, h("m m m m"))))
    // two disjoint merged spans (gap 6 > k), each 5 tokens
    assert(out(5L) === ((13L, 2L, 10L, h("f1 f2 f3"))))
    assert(out(6L) === ((13L, 2L, 10L, h("g1 g2 g3"))))
  }

  test("codegen'd vector kernels are bit-identical to the HOF folds") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val d = 1 + rnd.nextInt(8) * 8
      Row(i.toLong, Array.fill(d)(rnd.nextFloat() * 2 - 1),
        Array.fill(d)(rnd.nextFloat() * 2 - 1))
    } :+ Row(200L, Array(1.0f, 2.0f), Array(3.0f)) // length mismatch -> null
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val cmp = df.select(col("id"),
      Similarity.dot(col("a"), col("b")).as("fast"),
      Similarity.dotFold(col("a"), col("b")).as("fold")).collect()
    cmp.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null mismatch at id ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
          s"bit mismatch at id ${r.getLong(0)}")
    }
    assert(cmp.count(_.isNullAt(1)) === 1) // exactly the mismatched row
  }

  test("semDedup: identical vectors dedup to the lower id, singletons survive") {
    val base = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        if (j == i % 8) 1.0f else 0.1f * ((i * 7 + j) % 5)))
    }
    // plant exact duplicates of ids 3 and 7 at high ids (same vector ⇒
    // same cluster, cosine 1.0)
    val rows = base ++ Seq((100L, base(3)._2.clone()), (101L, base(7)._2.clone()))
    val out = Similarity.semDedup(spark, rows.toDF("id", "vec"),
        k = 4, iterations = 2, tau = 0.999)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(out.size === 22)
    assert(out(3L)._2 === true)    // lower id of the dup pair survives
    assert(out(100L)._2 === false) // planted duplicate drops
    assert(out(7L)._2 === true)
    assert(out(101L)._2 === false)
    // duplicates land in the SAME cluster as their original
    assert(out(3L)._1 === out(100L)._1)
    assert(out(7L)._1 === out(101L)._1)
    // nothing else is near-identical at tau=0.999: all other rows kept
    assert(out.collect { case (id, (_, kept)) if !kept => id }.toSet ===
      Set(100L, 101L))
  }

  test("ngramContainment: excerpt side saturates, disjoint pairs zero, sub-k fallback") {
    val docs = Seq(
      (1L, "one two three four five six"), // 4 grams
      (2L, "one two three four"),          // 2 grams, both inside doc 1
      (3L, "xx yy"),                       // sub-k: one whole-doc gram
      (4L, "one two three")                // exactly k: one gram
    ).toDF("doc_id", "text")
    val pairs = Seq((2L, 1L), (3L, 1L), (4L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.ngramContainment(pairs, docs, "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // doc 2's grams are a strict subset of doc 1's: containment is
    // total from the small side, half from the large side — the
    // quote-inclusion signal Jaccard (2/4 = 0.5) understates.
    assert(out((2L, 1L)) === ((2L, 4L, 2L, 1000L, 500L)))
    assert(out((3L, 1L)) === ((1L, 4L, 0L, 0L, 0L)), "disjoint pair is zero")
    assert(out((4L, 2L)) === ((1L, 2L, 1L, 1000L, 500L)),
      "exact-k doc contributes its single gram")
  }
}
