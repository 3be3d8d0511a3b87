package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Hashing

/** Deduplication operators for web-scale training-data curation:
  * exact, MinHash+LSH, SimHash and n-gram-Jaccard near-dup — each a
  * DataFrame → DataFrame transform whose heavy lifting is hash
  * partitioning (groupBy on short keys), never an all-pairs compare.
  *
  * Scale shape, in order of cost at 10^10 docs:
  *  - exact: one shuffle on a 16-byte key;
  *  - minhash-LSH: per-row signature (map-side) + one shuffle per band
  *    on (band, bandHash) — candidate pairs only within buckets;
  *  - simhash: per-row 64-bit sketch + pigeonhole band join;
  *  - verification joins are bounded by bucket sizes, and BOTH
  *    candidate-pair generators cap pathological buckets explicitly
  *    (a 10^6-doc boilerplate bucket would otherwise explode
  *    quadratically). The cap is deterministic (lowest ids kept) and
  *    NEVER silent: every capped run emits `capped_buckets` /
  *    `rows_dropped_by_cap` as an observed metric on the banded scan
  *    (visible to any QueryExecutionListener, and readable directly by
  *    passing an [[org.apache.spark.sql.Observation]]).
  */
object Dedup {

  /** Attach the cap-loudness metric to the banded rows (which carry
    * `rn`, the deterministic row_number within each (band, key)
    * bucket): `capped_buckets` = buckets that overflowed `maxBucket`,
    * `rows_dropped_by_cap` = banded rows the cap removed. Emitted on
    * EVERY run — through the caller's [[Observation]] when provided,
    * else under a unique auto name so the metric still reaches
    * listener-based metric sinks (names must be unique per query, so
    * a fixed name would break plans using both LSH variants).
    */
  private val capMetricSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private def observeCap(banded: DataFrame, maxBucket: Int,
                         obs: Option[Observation]): DataFrame = {
    val cappedBuckets =
      sum(when(col("rn") === maxBucket + 1, 1L).otherwise(0L))
        .as("capped_buckets")
    val droppedRows =
      sum(when(col("rn") > maxBucket, 1L).otherwise(0L))
        .as("rows_dropped_by_cap")
    obs match {
      case Some(o) => banded.observe(o, cappedBuckets, droppedRows)
      case None => banded.observe(
        s"minhash_lsh_cap_${capMetricSeq.incrementAndGet()}",
        cappedBuckets, droppedRows)
    }
  }

  // ---------- exact ----------

  /** Exact duplicate groups by md5 of a normalized text column: returns
    * (dedup key, representative id, group size). One hash shuffle.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(trim(lower(col(textCol)))).as("dup_key"))
      .groupBy("dup_key")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  /** Keep one representative row per exact-duplicate group (min id —
    * deterministic). Window-free formulation: groupBy + semi-join,
    * which scales better than a global window at 10^10 rows.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ---------- shingles + minhash ----------

  /** Word k-shingle hashes of a text column (distinct, sorted for
    * determinism). Pure function per row.
    */
  def shingleUdf(k: Int) = udf { (text: String) =>
    if (text == null) Array.empty[Long]
    else {
      val toks = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
      if (toks.length < k) {
        if (toks.isEmpty) Array.empty[Long] else Array(Hashing.xxhash64(toks.mkString(" ")))
      } else {
        val set = scala.collection.mutable.TreeSet.empty[Long]
        var i = 0
        while (i + k <= toks.length) {
          set += Hashing.xxhash64(toks.slice(i, i + k).mkString(" "))
          i += 1
        }
        set.toArray
      }
    }
  }

  /** MinHash signature of a shingle-hash array: n universal-hash
    * permutations h_i(x) = a_i·x + b_i (odd a_i), min over shingles.
    * Empty shingle set ⇒ all Long.MaxValue (never collides).
    */
  def minhashUdf(numHashes: Int, seed: Long = 42L) = {
    val as = Array.tabulate(numHashes)(i => Hashing.xxhash64(s"a:$seed:$i") | 1L)
    val bs = Array.tabulate(numHashes)(i => Hashing.xxhash64(s"b:$seed:$i"))
    udf { (shingles: Array[Long]) =>
      val sig = Array.fill(numHashes)(Long.MaxValue)
      if (shingles != null) {
        var i = 0
        while (i < shingles.length) {
          val s = shingles(i)
          var j = 0
          while (j < numHashes) {
            val h = as(j) * s + bs(j)
            if (h < sig(j)) sig(j) = h
            j += 1
          }
          i += 1
        }
      }
      sig
    }
  }

  /** MinHash+LSH near-duplicate PAIRS.
    *
    * Pipeline: shingle → signature → explode into `bands` band keys
    * (hash of the signature's rows in that band) → self-join within
    * (band, key) buckets → distinct pairs → estimate Jaccard from full
    * signatures → filter ≥ threshold.
    *
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    *
    * `maxBucket` caps pathological buckets (pairs in a bucket grow
    * quadratically) deterministically — lowest ids kept — and the cap
    * is LOUD: `capped_buckets` / `rows_dropped_by_cap` are emitted as
    * an observed metric on every run (pass `capMetrics` to read them
    * directly; see [[observeCap]]). Callers at 10^10 scale should
    * still route mega-buckets (usually exact boilerplate) through
    * exactDedup first.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.7, maxBucket: Int = 1000,
                   capMetrics: Option[Observation] = None): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigs = df.select(col(idCol).as("doc_id_"),
        minhashUdf(numHashes)(shingleUdf(shingleK)(col(textCol))).as("sig"))

    val bandHash = udf { (sig: Array[Long], band: Int) =>
      var h = 1125899906842597L
      var i = band * rowsPerBand
      while (i < (band + 1) * rowsPerBand) { h = h * 31 + sig(i); i += 1 }
      h
    }
    val banded = sigs.select(col("doc_id_"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bkey", bandHash(col("sig"), col("band")))

    // cap pathological buckets deterministically (keep lowest ids),
    // loudly (observed metric)
    val wB = Window.partitionBy("band", "bkey").orderBy("doc_id_")
    val capped = observeCap(banded.withColumn("rn", row_number().over(wB)),
        maxBucket, capMetrics)
      .filter(col("rn") <= maxBucket).drop("rn")

    val left = capped.select(col("band"), col("bkey"),
      col("doc_id_").as("id_a"), col("sig").as("sig_a"))
    val right = capped.select(col("band"), col("bkey"),
      col("doc_id_").as("id_b"), col("sig").as("sig_b"))
    val simUdf = udf { (a: Array[Long], b: Array[Long]) =>
      var same = 0; var i = 0
      while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
      same.toDouble / a.length
    }
    // estimate + threshold BEFORE the pair dedup: the pair determines
    // its signatures, so est_jaccard is identical on every duplicate
    // candidate row and filter∘dedup ≡ dedup∘filter — the dedup
    // exchange then carries (long, long, double) instead of two
    // numHashes-long signature arrays (guide §2.3/§8), and the
    // dedup is a map-side-combinable hash aggregate instead of the
    // Sort+SortAggregate Spark falls back to when First() holds an
    // array. A pair sharing b bands evaluates the estimate b times —
    // numHashes compares per copy, cheaper than sort-shuffling the
    // arrays those copies carried.
    left.join(right, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        simUdf(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Near-dup dedup via MinHash: the scalable per-wave approximation —
    * removes every doc that pairs with a lower id (union-find-free, one
    * pass, deterministic). [[minhashDedupTransitive]] is the full
    * connected-components variant.
    */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.7): DataFrame = {
    val pairs = minhashPairs(df, idCol, textCol, threshold = threshold)
    val losers = pairs.select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Minimum reachable label per vertex over an undirected pair graph —
    * iterative min propagation with POINTER HALVING to a fixpoint (the
    * label-propagation connected-components kernel, accelerated): each
    * round every vertex takes (a) the min of its neighbors' labels (one
    * hop) and (b) the label OF its label (shortcutting — min labels
    * only shrink, so composing the label map with itself is sound).
    * The shortcut doubles the propagation distance per round, so rounds
    * are O(log component-diameter) instead of O(diameter) — a
    * 1000-vertex chain converges in ~10 rounds, not ~1000. Each round
    * is two equi-joins + one aggregate — no driver-side graph state.
    * Returns (v, label).
    *
    * `reliableCheckpoints=true` swaps the per-round eager
    * `localCheckpoint` (executor-local blocks — lost-executor-UNSAFE
    * on a real cluster) for `checkpoint()` to the SparkContext's
    * checkpoint dir (DFS on a cluster): the caller must have called
    * `sc.setCheckpointDir` first. Same plan shape, same results; the
    * 10^10-vertex cluster run wants the reliable path.
    */
  def connectedMinLabels(vertices: DataFrame, pairs: DataFrame,
                         maxIterations: Int = 50,
                         reliableCheckpoints: Boolean = false): DataFrame = {
    val edges = pairs.select(col("id_a"), col("id_b")).unionByName(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b"))).persist()
    // EAGER checkpoint each round, not persist: a persisted DataFrame
    // keeps its full logical plan, and every round embeds the
    // previous round's plan ~3× (neighbor join + the halving self-join)
    // — analysis cost grows 3^rounds and a 12-round run kills the
    // driver. Checkpointing flattens the plan to a LogicalRDD so each
    // round re-analyzes O(1) nodes.
    val ckpt: DataFrame => DataFrame =
      if (reliableCheckpoints) { d =>
        require(d.sparkSession.sparkContext.getCheckpointDir.isDefined,
          "reliableCheckpoints=true requires sc.setCheckpointDir (a DFS path on a cluster)")
        d.checkpoint(eager = true)
      } else _.localCheckpoint(true)
    var labels = ckpt(vertices.select(col(vertices.columns.head).as("v"))
      .withColumn("label", col("v")))
    var iter = 0
    var converged = false
    // the edges cache must be released on every exit path (fixpoint,
    // non-convergence throw, Spark failure mid-loop); checkpointed
    // label RDDs are released by the ContextCleaner as references drop
    try {
      converged = edges.isEmpty
      while (!converged && iter < maxIterations) {
        val neighborMin = edges
          .join(labels, edges("id_b") === labels("v"))
          .groupBy(col("id_a").as("nv")).agg(min(col("label")).as("nmin"))
        // the round's previous label rides along as `prev` so the
        // convergence check is a join-FREE scan of the checkpointed
        // result (the old form re-joined next against labels — one
        // whole extra shuffle join per round just to count changes)
        val hop = ckpt(labels
          .join(neighborMin, labels("v") === col("nv"), "left")
          .select(col("v"), col("label").as("prev"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label")))
        // pointer halving: label := min(label, label(label)) — min
        // labels only shrink, so composing the label map with itself is
        // sound and doubles propagation distance per round
        val next = ckpt(hop.as("a")
          .join(hop.select(col("v").as("lv"), col("label").as("llabel")),
            col("a.label") === col("lv"), "left")
          .select(col("a.v").as("v"), col("a.prev").as("prev"),
            least(col("a.label"), coalesce(col("llabel"), col("a.label")))
              .as("label")))
        val changed = next
          .filter(col("label") =!= col("prev")).limit(1).count()
        labels = next.select(col("v"), col("label"))
        converged = changed == 0L
        iter += 1
      }
      // a silent non-fixpoint would violate the one-per-component
      // contract downstream — fail loudly instead (a component diameter
      // beyond ~2^maxIterations means the caller should raise the bound)
      if (!converged)
        throw new IllegalStateException(
          s"connectedMinLabels did not converge within $maxIterations rounds")
      labels
    } finally {
      edges.unpersist()
    }
  }

  /** Fully transitive near-dup dedup: keep exactly one doc (the min id)
    * per CONNECTED COMPONENT of the minhash pair graph. The survivor
    * set is always a subset of [[minhashDedup]]'s (chains collapse).
    */
  def minhashDedupTransitive(df: DataFrame, idCol: String, textCol: String,
                             threshold: Double = 0.7,
                             maxIterations: Int = 20,
                             reliableCheckpoints: Boolean = false): DataFrame = {
    val pairs = minhashPairs(df, idCol, textCol, threshold = threshold)
      .select("id_a", "id_b")
    val labels = connectedMinLabels(df.select(col(idCol)), pairs, maxIterations,
      reliableCheckpoints)
    val keep = labels.filter(col("label") === col("v")).select(col("v").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ---------- simhash ----------

  /** 64-bit SimHash of a text column: per-token hash votes on each bit.
    * Near-dups differ in few bits (small Hamming distance).
    */
  def simhashUdf = udf { (text: String) =>
    if (text == null) 0L
    else {
      val votes = new Array[Int](64)
      text.toLowerCase.split("\\W+").filter(_.nonEmpty).foreach { tok =>
        val h = Hashing.xxhash64(tok)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, found by
    * the pigeonhole band trick: split the 64-bit sketch into
    * maxDist+1 chunks — any pair within distance shares at least one
    * exact chunk, so candidates come from equi-joins on (chunk index,
    * chunk value), never an all-pairs scan.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks
    val sketched = df.select(col(idCol).as("doc_id_"),
      simhashUdf(col(textCol)).as("sketch"))
    val chunkUdf = udf { (sketch: Long, c: Int) =>
      (sketch >>> (c * bitsPer)) & ((1L << bitsPer) - 1)
    }
    val banded = sketched
      .select(col("doc_id_"), col("sketch"),
        explode(sequence(lit(0), lit(chunks - 1))).as("chunk"))
      .withColumn("ckey", chunkUdf(col("sketch"), col("chunk")))
    val left = banded.select(col("chunk"), col("ckey"),
      col("doc_id_").as("id_a"), col("sketch").as("sk_a"))
    val right = banded.select(col("chunk"), col("ckey"),
      col("doc_id_").as("id_b"), col("sketch").as("sk_b"))
    val hamming = udf { (a: Long, b: Long) => java.lang.Long.bitCount(a ^ b) }
    left.join(right, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sk_a", "sk_b").distinct()
      .withColumn("hamming", hamming(col("sk_a"), col("sk_b")))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** SQL-portable MinHash+LSH pairs, PURE CATALYST and stated
    * relationally (no per-element lambda touches another column — see
    * the O(n²) re-inlining hazard documented on
    * [[graft.functions.TextAnalysis.winnowFingerprintsTokens]]):
    *
    *  1. tokens → complete word 3-shingles via posexplode + window
    *     lead (docs with < k tokens shingle as their joined tokens);
    *  2. signature row (doc, j, min over shingles of
    *     portableHash(j:shingle)) via one explode + one aggregate;
    *  3. signatures assembled ordered (sort_array of (j, minhash));
    *  4. band keys = md5 of each band's signature slice; buckets
    *     capped at `maxBucket` rows (deterministic `row_number ≤ cap`
    *     by doc id, LOUD via the observed cap metric — same rule as
    *     [[minhashPairs]], statable verbatim in the SQL oracle: one
    *     viral-boilerplate bucket of 10^6 near-identical docs would
    *     otherwise detonate quadratically); candidate pairs from
    *     (band, key) equi-joins — never all-pairs;
    *  5. est_jaccard = matching signature rows / numHashes.
    *
    * Same banding semantics as [[minhashPairs]]; every step is a
    * built-in expression a DuckDB oracle states identically. The
    * xxhash permutation variant remains the raw-throughput path.
    */
  def minhashPairsPortable(df: DataFrame, idCol: String, textCol: String,
                           shingleK: Int = 3, numHashes: Int = 24,
                           bands: Int = 8, threshold: Double = 0.5,
                           maxBucket: Int = 1000,
                           capMetrics: Option[Observation] = None): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    // the WHOLE signature in one generated pass per row
    // ([[graft.plans.MinhashSig]]): shingling and the 24 md5-word
    // minima are row-local, so the signature stage is now a PURE MAP
    // fused with the scan — the relational statement (posexplode +
    // window leads + one min aggregate, kept below as
    // [[minhashSigsRelational]], equivalence test-pinned) shuffled the
    // whole token stream into doc-keyed window sorts to compute 24
    // per-doc numbers (guide §2.4: the banding join is this operator's
    // only fundamental exchange). Null-text docs yield a null
    // signature and are dropped, exactly like the old size filters.
    val sigs = df.select(col(idCol).as("doc_id_"),
        graft.plans.MinhashSig.minhash_sig(
          split(lower(col(textCol)), "\\W+"),
          lit(shingleK), lit(numHashes)).as("sig"))
      .filter(col("sig").isNotNull)

    val banded = sigs
      .select(col("doc_id_"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bkey",
        md5(concat_ws(",", slice(col("sig"), col("band") * rowsPerBand + 1,
          lit(rowsPerBand)).cast("array<string>"))))
    // cap pathological buckets deterministically (keep lowest ids),
    // loudly (observed metric) — identical rule to minhashPairs and
    // stated verbatim in the SQL oracle
    val wB = Window.partitionBy("band", "bkey").orderBy("doc_id_")
    val capped = observeCap(banded.withColumn("rn", row_number().over(wB)),
        maxBucket, capMetrics)
      .filter(col("rn") <= maxBucket).drop("rn")
    val left = capped.select(col("band"), col("bkey"),
      col("doc_id_").as("id_a"), col("sig").as("sig_a"))
    val right = capped.select(col("band"), col("bkey"),
      col("doc_id_").as("id_b"), col("sig").as("sig_b"))
    // estimate + threshold BEFORE the pair dedup (same proxy-dedup
    // rationale as [[minhashPairs]], stated there): identical rows
    // out, scalar-only dedup exchange, hash aggregate instead of the
    // array-payload sort aggregate.
    left.join(right, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes, 4)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "est_jaccard")
  }

  /** The original relational statement of the portable MinHash
    * signatures — posexplode + window leads build the shingles, one
    * aggregate takes the `numHashes` minima (permutation j's hash is
    * 32-bit word j%4 of md5((j/4) ':' shingle); the md5s are hoisted
    * below the aggregate so 24 permutations cost 6 evaluations per
    * shingle). Kept as the executable semantics statement the
    * [[graft.plans.MinhashSig]] kernel must match (equivalence
    * test-pinned); the kernel is the production path.
    */
  private[graft] def minhashSigsRelational(df: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 3, numHashes: Int = 24): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "\\W+"), t => length(t) > 0)
    val docsT = df.select(col(idCol).as("doc_id_"), toks.as("tk"))
    val w = Window.partitionBy("doc_id_").orderBy("pos")
    val leadCols = (1 until shingleK).map(i => lead(col("tok"), i).over(w).as(s"l$i"))
    val bigShingles = docsT.filter(size(col("tk")) >= shingleK)
      .select(col("doc_id_"), posexplode(col("tk")).as(Seq("pos", "tok")))
      .select((col("doc_id_") +: col("tok") +: leadCols): _*)
      .filter(col(s"l${shingleK - 1}").isNotNull)
      .select(col("doc_id_"), concat_ws(" ",
        (col("tok") +: (1 until shingleK).map(i => col(s"l$i"))): _*).as("sh"))
    val smallShingles = docsT.filter(size(col("tk")) < shingleK)
      .select(col("doc_id_"), concat_ws(" ", col("tk")).as("sh"))
    val shingles = bigShingles.unionByName(smallShingles)
    val md5Groups = (numHashes + 3) / 4
    val withMd5 = shingles.select(col("doc_id_") +:
      (0 until md5Groups).map(g =>
        md5(concat(lit(s"$g:"), col("sh"))).as(s"m$g")): _*)
    val minCols = (0 until numHashes).map { j =>
      min(conv(substring(col(s"m${j / 4}"), 1 + 8 * (j % 4), 8), 16, 10)
        .cast("long")).as(s"mh$j")
    }
    withMd5.groupBy(col("doc_id_"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id_"),
        array((0 until numHashes).map(j => col(s"mh$j")): _*).as("sig"))
  }

  /** Benchmark decontamination: exact token-`k`-gram overlap between
    * corpus documents and a benchmark set — the standard train/test
    * contamination check of an LLM data pipeline (a document sharing
    * any verbatim k-gram with an evaluation document must be flagged
    * or dropped before training). Distinct from the similarity family:
    * this is exact containment, not approximate resemblance.
    *
    * Scale shape: grams join on md5(gram) (fixed 32-char key, no
    * collision at any realistic corpus size); the benchmark side is
    * small by nature (an eval suite) and broadcasts — the corpus side
    * never shuffles. Returns one row per CONTAMINATED corpus doc:
    * (doc_id_, shared_grams, bench_docs_hit).
    *
    * `benchDocs` supplies the benchmark membership (same id/text
    * shape); corpus rows that are themselves benchmark rows are
    * excluded from flagging (self-overlap is not contamination).
    */
  def contamination(df: DataFrame, benchDocs: DataFrame, idCol: String,
                    textCol: String, k: Int = 8): DataFrame = {
    val grams = tokenGramKeys(df, idCol, textCol, k)
    val bench = tokenGramKeys(benchDocs, idCol, textCol, k)
      .select(col("doc_id_").as("bench_id"), col("gk"))
    grams.join(broadcast(bench), Seq("gk"))
      .filter(col("doc_id_") =!= col("bench_id"))
      .groupBy(col("doc_id_"))
      .agg(countDistinct(col("gk")).as("shared_grams"),
        countDistinct(col("bench_id")).as("bench_docs_hit"))
  }

  /** Gradated benchmark decontamination — the DECISION metric on top
    * of [[contamination]]: the fraction of a document's distinct token
    * k-grams that appear anywhere in the benchmark set, integer-exact
    * in milli-units, plus the keep/drop verdict at `thresholdMilli`
    * (public practice — e.g. the GPT-3 appendix and Lee et al. 2022
    * report and threshold n-gram OVERLAP, not a binary any-hit flag,
    * because a single colliding idiom should not discard a long
    * document). Documents with fewer than `k` tokens have no k-grams
    * and are not emitted (they cannot be contaminated at this
    * granularity).
    *
    *   contam_milli = (1000 · |doc grams ∩ bench grams|) DIV |doc grams|
    *
    * Scale shape at 10^10 docs: the bench gram set is bounded by the
    * BENCHMARK size (small by nature — the one dimension in this
    * family that is safe to broadcast, same reasoning as
    * [[contamination]]); everything else is two doc-keyed aggregates.
    *
    * @return (idCol, total_grams, shared_grams, contam_milli,
    *         contaminated)
    */
  def contaminationFraction(df: DataFrame, benchDocs: DataFrame,
                            idCol: String, textCol: String, k: Int = 8,
                            thresholdMilli: Long = 100L): DataFrame = {
    // the per-doc gram TOTAL is the size of the kernel's distinct
    // gram array — a pure map, where the former shape aggregated the
    // exploded gram stream a second time just to count it
    val docGrams = df.select(col(idCol).as("doc_id_"),
        tokenGramKeyArr(textCol, k).as("gks"))
      .filter(size(col("gks")) > 0) // sub-k and null-text docs have no k-grams
    val bench = tokenGramKeys(benchDocs, idCol, textCol, k)
      .select(col("gk")).distinct()
    val totals = docGrams.select(col("doc_id_"),
      size(col("gks")).cast("long").as("total_grams"))
    val shared = docGrams.select(col("doc_id_"), explode(col("gks")).as("gk"))
      .join(broadcast(bench), Seq("gk"))
      .groupBy(col("doc_id_"))
      .agg(count(lit(1)).as("shared_grams"))
    totals.join(shared, Seq("doc_id_"), "left")
      .select(col("doc_id_").as(idCol), col("total_grams"),
        coalesce(col("shared_grams"), lit(0L)).as("shared_grams"))
      .withColumn("contam_milli",
        expr("(1000 * shared_grams) DIV total_grams"))
      .withColumn("contaminated", col("contam_milli") >= thresholdMilli)
  }

  /** Per-doc DISTINCT gram-key ARRAY ([[graft.plans.GramKeys]], one
    * generated pass per row): null for null text, empty for sub-k
    * docs (no whole-doc fallback). The former relational shape
    * (posexplode + window lead + corpus-wide distinct — kept below as
    * [[gramKeysRelational]], equivalence test-pinned) shuffled the
    * whole token stream into doc-keyed window sorts and paid a second
    * full exchange for the distinct; the kernel makes gram derivation
    * (and the gram COUNT, via `size`) row-local. The within-row
    * distinct equals the corpus-wide one under the unique-id contract
    * every catalog table guarantees.
    */
  private def tokenGramKeyArr(textCol: String, k: Int): Column =
    graft.plans.GramKeys.gram_keys(
      split(lower(col(textCol)), "[^a-z0-9_]+"), lit(k), lit(false))

  /** Distinct (doc, md5(token k-gram)) pairs via [[tokenGramKeyArr]]. */
  private def tokenGramKeys(df: DataFrame, idCol: String, textCol: String,
                            k: Int): DataFrame =
    df.select(col(idCol).as("doc_id_"),
      explode(tokenGramKeyArr(textCol, k)).as("gk"))

  /** The original relational statement of the distinct per-doc gram
    * keys, parameterized over the tokenizer and the sub-k fallback —
    * kept as the executable semantics the [[graft.plans.GramKeys]]
    * kernel must match (equivalence test-pinned); the kernel is the
    * production path. Returns distinct (doc_id_, gk) rows.
    */
  private[graft] def gramKeysRelational(df: DataFrame, idCol: String,
      textCol: String, k: Int, splitPattern: String,
      wholeDocFallback: Boolean): DataFrame = {
    val toks = filter(split(lower(col(textCol)), splitPattern),
      t => length(t) > 0)
    val docsT = df.select(col(idCol).as("doc_id_"), toks.as("tk"))
    val w = Window.partitionBy("doc_id_").orderBy("pos")
    val leadCols = (1 until k).map(i => lead(col("tok"), i).over(w).as(s"l$i"))
    val big = docsT.filter(size(col("tk")) >= k)
      .select(col("doc_id_"), posexplode(col("tk")).as(Seq("pos", "tok")))
      .select((col("doc_id_") +: col("tok") +: leadCols): _*)
      .filter(col(s"l${k - 1}").isNotNull)
      .select(col("doc_id_"), md5(concat_ws(" ",
        (col("tok") +: (1 until k).map(i => col(s"l$i"))): _*)).as("gk"))
    val small = docsT.filter(size(col("tk")) < k)
      .select(col("doc_id_"), md5(concat_ws(" ", col("tk"))).as("gk"))
    (if (wholeDocFallback) big.unionByName(small) else big).distinct()
  }

  /** SQL-portable SimHash sketch, PURE CATALYST: per-token 32-bit
    * [[graft.functions.TextAnalysis.portableHash]] votes on each bit
    * (majority wins). Bit extraction is power-of-two arithmetic
    * (exact in doubles for 32-bit values) so DuckDB states the
    * identical computation — the oracle checks the whole sketch.
    */
  /** Per-token portable hashes of a text column. */
  def portableTokenHashes(text: Column): Column =
    transform(filter(split(lower(text), "\\W+"), t => length(t) > 0),
      t => graft.functions.TextAnalysis.portableHash(t))

  /** Majority-vote portable sketches, stated RELATIONALLY: explode the
    * TOKENS, hash each in a codegen'd projection (round-6: hashing
    * inside the `transform` lambda ran the md5 through the interpreted
    * HOF path per token), and aggregate `bits` signed bit-votes per
    * document in ONE hash aggregate (a lambda formulation would
    * re-evaluate the token-hash array per bit after projection
    * collapse — 32× the hashing). Token-less documents sketch to 0
    * (explode_outer keeps them as one null-token row whose null hash
    * never wins a bit). Returns (doc_id_, sketch).
    */
  private def portableSketches(df: DataFrame, idCol: String, textCol: String,
                               bits: Int): DataFrame =
    // the WHOLE majority-vote sketch in one generated pass per row
    // ([[graft.plans.PortableSimhash]]) — a PURE MAP fused with the
    // scan; the relational statement (explode + hash projection + one
    // bits-column vote aggregate, kept below as
    // [[portableSketchesRelational]], equivalence test-pinned)
    // shuffled every token hash into a doc-keyed aggregate for one
    // per-row long. Token-less and null-text docs sketch to 0, the
    // explode_outer behavior.
    df.select(col(idCol).as("doc_id_"),
      graft.plans.PortableSimhash.portable_simhash(
        split(lower(col(textCol)), "\\W+"), lit(bits)).as("sketch"))

  /** The original relational statement of [[portableSketches]] — kept
    * as the executable semantics the native kernel must match
    * (equivalence test-pinned); the kernel is the production path.
    */
  private[graft] def portableSketchesRelational(df: DataFrame, idCol: String,
      textCol: String, bits: Int): DataFrame = {
    val hrows = df.select(col(idCol).as("doc_id_"),
        explode_outer(filter(split(lower(col(textCol)), "\\W+"),
          t => length(t) > 0)).as("tok"))
      .select(col("doc_id_"),
        graft.functions.TextAnalysis.portableHash(col("tok")).as("h"))
    val voteCols = (0 until bits).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$b")
    }
    val sketch = (0 until bits).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    hrows.groupBy("doc_id_").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id_"), sketch.as("sketch"))
  }

  /** SimHash near-dup pairs over the PORTABLE 32-bit sketch — same
    * pigeonhole band join as [[simhashPairs]] (chunks = maxDist+1,
    * candidates only from shared-chunk buckets, never all-pairs), but
    * every step is a built-in expression, so a SQL oracle can verify
    * end to end. The 64-bit xxhash variant remains the throughput
    * path; this one is the verification-grade twin.
    */
  def simhashPairsPortable(df: DataFrame, idCol: String, textCol: String,
                           maxDist: Int = 3, bits: Int = 32): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = bits / chunks
    val sketched = portableSketches(df, idCol, textCol, bits)
    val banded = sketched
      .select(col("doc_id_"), col("sketch"),
        explode(sequence(lit(0), lit(chunks - 1))).as("chunk"))
      .withColumn("ckey",
        pmod(floor(col("sketch") / pow(lit(2.0), col("chunk") * bitsPer)).cast("long"),
          lit(1L << bitsPer)))
    val left = banded.select(col("chunk"), col("ckey"),
      col("doc_id_").as("id_a"), col("sketch").as("sk_a"))
    val right = banded.select(col("chunk"), col("ckey"),
      col("doc_id_").as("id_b"), col("sketch").as("sk_b"))
    left.join(right, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sk_a", "sk_b").distinct()
      .withColumn("hamming", bit_count(col("sk_a").bitwiseXOR(col("sk_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  // ---------- exact n-gram jaccard ----------

  /** Exact n-gram Jaccard similarity for candidate pairs — the
    * verification stage behind the MinHash estimate. `pairs` carries
    * (id_a, id_b); texts join in by id. Pure Catalyst set algebra
    * (array_intersect / array_union on shingle arrays).
    */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                   textCol: String, k: Int = 5): DataFrame = {
    val sh = docs.select(col(idCol).as("jid"),
      shingleUdf(k)(col(textCol)).as("jsh"))
    pairs
      .join(sh.select(col("jid").as("id_a"), col("jsh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("jid").as("id_b"), col("jsh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        when(size(array_union(col("sh_a"), col("sh_b"))) === 0, lit(0.0))
          .otherwise(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double")))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Asymmetric n-gram containment over candidate pairs:
    * cont(A→B) = |grams(A) ∩ grams(B)| / |grams(A)|, both directions,
    * in integer milli (truncating DIV — no float ties). Containment is
    * the dup signal symmetric Jaccard misses: a short document quoted
    * verbatim inside a long one has LOW Jaccard (the union is large)
    * but containment 1.0 from the short side — the quote-inclusion /
    * boilerplate-wrapping case of public near-dup practice (Broder's
    * original resemblance/containment pair). Run it as the verify
    * stage on LSH candidate pairs, exactly like [[ngramJaccard]].
    *
    * Word k-grams with the same derivation as the portable MinHash
    * shingles (lowercase, `\W+` split, sub-k docs fall back to the
    * whole-doc gram), keyed on md5 — stated relationally (posexplode +
    * lead, never an array column inside a lambda).
    *
    * Scale shape: pair-bounded — grams join pairs on the doc key, then
    * the shared-gram count is one equi-join on (id_b, gram) + one
    * aggregate; per-doc gram counts ride a doc-keyed aggregate. No
    * all-pairs anywhere: the quadratic risk lives in the candidate
    * generator, which caps its buckets ([[minhashPairsPortable]]).
    *
    * @return (id_a, id_b, n_a, n_b, n_shared, cont_a_milli, cont_b_milli)
    */
  def ngramContainment(pairs: DataFrame, docs: DataFrame, idCol: String,
                       textCol: String, k: Int = 3): DataFrame = {
    // per-doc distinct gram keys in one generated pass
    // ([[graft.plans.GramKeys]], whole-doc fallback for sub-k docs —
    // the same derivation as the portable MinHash shingles); gram
    // COUNTS are the array size, a pure map — the former relational
    // shape (kept as [[gramKeysRelational]], equivalence test-pinned)
    // paid a doc-keyed window shuffle, a corpus-wide distinct AND a
    // counting aggregate for what one projection now computes.
    val docsK = docs.select(col(idCol).as("cid"),
        graft.plans.GramKeys.gram_keys(
          split(lower(col(textCol)), "\\W+"), lit(k), lit(true)).as("gs"))
      .filter(col("gs").isNotNull) // null-text docs carry no grams
    val grams = docsK.select(col("cid"), explode(col("gs")).as("g"))
    val counts = docsK.select(col("cid"), size(col("gs")).cast("long").as("n"))

    val shared = pairs.select(col("id_a"), col("id_b"))
      .join(grams.select(col("cid").as("id_a"), col("g")), Seq("id_a"))
      .join(grams.select(col("cid").as("id_b"), col("g")), Seq("id_b", "g"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
    pairs.select(col("id_a"), col("id_b"))
      .join(counts.select(col("cid").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(counts.select(col("cid").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .join(shared, Seq("id_a", "id_b"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("cont_a_milli", expr("(1000 * n_shared) DIV n_a"))
      .withColumn("cont_b_milli", expr("(1000 * n_shared) DIV n_b"))
      .select("id_a", "id_b", "n_a", "n_b", "n_shared",
        "cont_a_milli", "cont_b_milli")
  }

  // ---------- cross-corpus paragraph dedup (C4-style) ----------

  /** Remove duplicated paragraphs ACROSS the corpus, keeping only the
    * globally-first occurrence (lexicographic (doc_id, pos)) of each
    * substantial paragraph — the C4 "discard repeated lines" curation
    * stage, applied corpus-wide rather than per-page. Paragraphs
    * shorter than `minLen` chars after space-trim are never deduped
    * (navigation crumbs and one-word lines would otherwise collapse
    * unrelated pages).
    *
    * Returns one row per input doc: total paragraph count, dropped
    * count, and md5 of the kept text (paragraphs rejoined by newline
    * in original order) so downstream equality checks need no text
    * exchange.
    *
    * Scale shape at 10^10 docs: paragraphs dedup-key on md5 (32-byte
    * key, not the text), first-occurrence via groupBy + partial-agg
    * min(struct) — window-free — then one hash join of eligible
    * paragraphs against the firsts table. Short paragraphs bypass the
    * join entirely (they would all share a null key and pile onto one
    * partition); viral-boilerplate hot keys are one row on the build
    * side and AQE skew-split handles the probe side.
    */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
                     minLen: Int = 40): DataFrame = {
    val para = df.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "para")))
      .withColumn("elig", length(trim(col("para"))) >= minLen)
    val eligible = para.filter(col("elig")).withColumn("h", md5(col("para")))
    val firsts = eligible.groupBy("h")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    val keptElig = eligible.join(firsts, Seq("h"))
      .withColumn("keep", col("first.doc_id") === col("doc_id") &&
        col("first.pos") === col("pos"))
      .select(col("doc_id"), col("pos"), col("para"), col("keep"))
    val keptShort = para.filter(!col("elig"))
      .select(col("doc_id"), col("pos"), col("para"), lit(true).as("keep"))
    keptElig.unionByName(keptShort)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_paras"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"),
        md5(array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("para"))))),
          x => x.getField("para")), "\n")).as("kept_hash"))
  }

  /** Global line-frequency scrub (the CCNet / RefinedWeb shard-level
    * "repeated lines" pass, public): count every line's occurrences
    * ACROSS the corpus and drop ALL occurrences of lines appearing in
    * ≥ `maxDf` documents — boilerplate (cookie banners, nav bars,
    * footers) repeats corpus-wide, prose doesn't. Distinct from
    * [[paragraphDedup]] (keep-FIRST of each paragraph): a
    * frequency-threshold scrub keeps NO copy of over-represented
    * lines and leaves under-threshold repeats alone. Lines shorter
    * than `minLen` trimmed chars bypass counting (crumbs/bullets
    * would dominate the key space).
    *
    * Returns one row per doc: line count, dropped count, md5 of the
    * kept text (lines rejoined in original order).
    *
    * Scale shape at 10^10 docs: lines key on md5 (fixed 32-byte key,
    * never the text); the document-frequency table is a groupBy with
    * partial aggregation (viral lines combine map-side), the verdict
    * join is a hash equi-join against that table pre-filtered to
    * OVER-threshold keys only (at web scale a tiny fraction of
    * distinct lines — the build side stays small without any
    * broadcast assumption on the full line dimension), and short
    * lines never enter the shuffle.
    */
  def lineFrequencyDedup(df: DataFrame, idCol: String, textCol: String,
                         maxDf: Int = 5, minLen: Int = 20): DataFrame = {
    val lines = df.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
      .withColumn("elig", length(trim(col("line"))) >= minLen)
    val eligible = lines.filter(col("elig")).withColumn("h", md5(col("line")))
    // doc-frequency: distinct docs per line key, kept only when the
    // threshold is crossed — the join's build side
    val over = eligible.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("docf"))
      .filter(col("docf") >= maxDf)
      .select(col("h"), lit(true).as("over"))
    val keptElig = eligible.join(over, Seq("h"), "left")
      .select(col("doc_id"), col("pos"), col("line"),
        col("over").isNull.as("keep"))
    val keptShort = lines.filter(!col("elig"))
      .select(col("doc_id"), col("pos"), col("line"), lit(true).as("keep"))
    keptElig.unionByName(keptShort)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"),
        md5(array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n")).as("kept_hash"))
  }

  // ---------- exact-substring span scrub ----------

  /** k-token duplicate-SPAN scrub — the distributable gram-granularity
    * formulation of exact-substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better":
    * remove every span that appears verbatim elsewhere in the corpus).
    * The paper's suffix-array construction is a single-machine
    * algorithm; the Spark-native equivalent works at k-token
    * resolution: every k-token gram whose corpus document frequency
    * is ≥ `minDf` marks its k-token window [pos, pos+k) as duplicated,
    * overlapping/adjacent windows merge, and the scrubbed document
    * keeps only uncovered tokens. A shared span of L ≥ k tokens is
    * covered exactly by its L−k+1 shared grams, so merged windows
    * recover cross-document spans at ±(k−1)-token boundary resolution
    * — spans shorter than k tokens are deliberately invisible (the
    * paper's own threshold plays the same role).
    *
    * Returns one row per doc: `n_tokens`, `n_spans` (merged duplicated
    * spans), `n_covered` (tokens inside them), `kept_hash` (md5 of the
    * uncovered tokens, space-rejoined in original order).
    *
    * Scale shape at 10^10 docs: grams key on md5 (fixed 32-byte key,
    * never the text); the gram document-frequency table is one
    * partial-aggregating groupBy pre-filtered to over-threshold keys
    * only, so the verdict semi-join's build side is DUPLICATED grams
    * only (the same bounded-build-side shape as [[lineFrequencyDedup]]
    * — at web scale a small fraction of distinct grams, with no
    * broadcast assumption on the full gram dimension). Span merging is
    * a per-token running-last window within one document (bounded by
    * document length, never corpus-global — a token is covered iff the
    * last flagged gram position at-or-before it is < k tokens back).
    * Everything is stated RELATIONALLY (posexplode + window lead/last)
    * — never an array-valued column inside a transform/filter lambda,
    * which projection collapse re-inlines per element into O(n²)
    * evaluation (the measured fingerprint foot-gun).
    */
  def duplicateSpanScrub(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, minDf: Int = 2): DataFrame = {
    require(k >= 1, "gram length k must be >= 1")
    // round-6 shape: gram keys per row ([[graft.plans.GramKeySeq]] —
    // posexplode reproduces the former (pos, hash) rows without the
    // doc-keyed window shuffle), the corpus-wide gram-df verdict
    // exactly as before (the one FUNDAMENTAL exchange of this
    // operator), then the flagged POSITIONS come back per doc as one
    // small array and the whole coverage/kept-hash summary is a
    // generated per-row kernel ([[graft.plans.SpanCoverage]]). The
    // former relational tail — token stream joined against the flags,
    // two doc-keyed window passes, a per-doc collect_list sort of
    // EVERY token — is kept as [[duplicateSpanScrubRelational]],
    // equivalence test-pinned. The flagged-position lists are bounded
    // by doc length, strictly smaller than the old all-token
    // collect_list.
    val rawToks = split(lower(col(textCol)), "[^a-z0-9_]+")
    val docsK = df.select(col(idCol).cast("long").as("doc_id"),
      rawToks.as("rtk"))
    val grams = docsK.select(col("doc_id"),
      posexplode(graft.plans.GramKeySeq.gram_key_seq(col("rtk"), lit(k)))
        .as(Seq("pos", "h")))
    val dup = grams.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("docf"))
      .filter(col("docf") >= minDf)
      .select("h")
    val flaggedPos = grams.join(dup, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(collect_list(col("pos")).as("fpos"))
    docsK.join(flaggedPos, Seq("doc_id"), "left")
      .select(col("doc_id"),
        graft.plans.SpanCoverage.span_coverage(col("rtk"), col("fpos"),
          lit(k)).as("g"))
      .select(col("doc_id"),
        col("g.n_tokens").as("n_tokens"), col("g.n_spans").as("n_spans"),
        col("g.n_covered").as("n_covered"), col("g.kept_hash").as("kept_hash"))
  }

  /** The original relational statement of [[duplicateSpanScrub]] —
    * kept as the executable semantics the GramKeySeq/SpanCoverage
    * kernels must match (equivalence test-pinned); the kernel path is
    * the production one.
    */
  private[graft] def duplicateSpanScrubRelational(df: DataFrame, idCol: String,
      textCol: String, k: Int = 8, minDf: Int = 2): DataFrame = {
    require(k >= 1, "gram length k must be >= 1")
    val toks = df.select(col(idCol).cast("long").as("doc_id"),
      posexplode(filter(split(lower(col(textCol)), "[^a-z0-9_]+"),
        t => length(t) > 0)).as(Seq("pos", "tok")))
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    // complete k-grams only: the (k-1)-ahead token exists
    val gramCols = col("tok") +:
      (1 until k).map(j => lead(col("tok"), j).over(wDoc))
    val grams = toks
      .withColumn("complete",
        if (k == 1) lit(true) else lead(col("tok"), k - 1).over(wDoc).isNotNull)
      .withColumn("h", md5(concat_ws(" ", gramCols: _*)))
      .where(col("complete"))
      .select(col("doc_id"), col("pos"), col("h"))
    val dup = grams.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("docf"))
      .filter(col("docf") >= minDf)
      .select("h")
    val flagged = grams.join(dup, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"), lit(1).as("flag"))
    val covered = toks.join(flagged, Seq("doc_id", "pos"), "left")
      .withColumn("lastf",
        last(when(col("flag") === 1, col("pos")), ignoreNulls = true)
          .over(wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cov", col("lastf").isNotNull && col("pos") < col("lastf") + k)
      .withColumn("prev_cov", lag(col("cov"), 1, false).over(wDoc))
    val perDoc = covered.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cov") && !col("prev_cov"), 1L).otherwise(0L)).as("n_spans"),
        sum(when(col("cov"), 1L).otherwise(0L)).as("n_covered"),
        md5(array_join(transform(
          array_sort(collect_list(when(!col("cov"),
            struct(col("pos"), col("tok"))))),
          x => x.getField("tok")), " ")).as("kept_hash"))
    df.select(col(idCol).cast("long").as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        coalesce(col("kept_hash"), md5(lit(""))).as("kept_hash"))
  }
}
