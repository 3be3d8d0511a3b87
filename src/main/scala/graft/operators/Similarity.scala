package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Hashing

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[cosineTopK]] — brute-force exact top-k, pure Catalyst
  *    (`zip_with` + `aggregate` for the dot product, codegen'd): the
  *    correctness baseline, O(|queries|·|corpus|);
  *  - [[lshTopK]] — random-hyperplane LSH buckets + exact rerank inside
  *    buckets: the scale path; recall tunable by (bits, tables).
  *
  * Embedding-cosine near-dup ([[cosineDupPairs]]) rides the same LSH
  * bucketing.
  */
object Similarity {

  /** dot(a,b) over two array<float> cols — a native codegen'd
    * expression ([[graft.plans.FloatDot]]) that replicates the
    * `aggregate(zip_with(a,b,_*_), 0.0d, _+_)` fold BIT-EXACTLY
    * (float multiply, double accumulate, element order): the HOF form
    * is CodegenFallback and its interpreted lambdas made pair scoring
    * ~100× slower than the generated loop.
    */
  def dot(a: Column, b: Column): Column = graft.plans.VectorExprs.float_dot(a, b)

  /** The original fold form, kept as the executable statement of the
    * semantics [[dot]] must match (equivalence is test-pinned).
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a,b); 0.0 when either norm is 0 (never NaN). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** Exact cosine top-k neighbors of every query vector.
    * `queries`/`corpus`: (id, vec). Returns (query_id, neighbor_id,
    * cosine, rank). Self-pairs excluded. The corpus side should be the
    * broadcast-able one; at bench scale Catalyst's BNLJ handles it.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qvec"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cvec"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Random-hyperplane signature: `bits` sign bits of projections onto
    * deterministic pseudo-random hyperplanes (seeded; plane component
    * j of plane p = centered hash in [-0.5, 0.5)). One long per table.
    */
  def hyperplaneSigUdf(bits: Int, dim: Int, table: Int, seed: Long = 42L) = {
    val planes: Array[Array[Float]] = Array.tabulate(bits) { p =>
      Array.tabulate(dim) { j =>
        ((Hashing.xxhash64(s"hp:$seed:$table:$p:$j") >>> 11).toDouble /
          (1L << 53).toDouble - 0.5).toFloat
      }
    }
    udf { (vec: Array[Float]) =>
      if (vec == null) 0L
      else {
        var sig = 0L
        var p = 0
        while (p < bits) {
          var s = 0.0f
          val plane = planes(p)
          val n = math.min(vec.length, plane.length)
          var j = 0
          while (j < n) { s += vec(j) * plane(j); j += 1 }
          if (s >= 0) sig |= (1L << p)
          p += 1
        }
        sig
      }
    }
  }

  /** Approximate cosine top-k: `tables` independent hyperplane hash
    * tables; candidates = corpus rows sharing a bucket with the query
    * in ANY table; exact cosine rerank inside the candidate set.
    * Recall rises with tables, bucket selectivity with bits.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              dim: Int, bits: Int = 12, tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, idName: String, vecName: String): DataFrame = {
      val perTable = (0 until tables).map { t =>
        df.select(col("id").as(idName), col("vec").as(vecName),
          lit(t).as("table"),
          hyperplaneSigUdf(bits, dim, t)(col("vec")).as("bucket"))
      }
      perTable.reduce(_ unionByName _)
    }
    val qb = bucketed(queries, "query_id", "qvec")
    val cb = bucketed(corpus, "neighbor_id", "cvec")
    // cosine BEFORE the candidate dedup (see [[lshTopKPortable]] for
    // the rationale — identical results, scalar-only dedup exchange)
    val candidates = qb.join(cb, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** SQL-portable hyperplane component: md5-derived double in
    * [-0.5, 0.5), computed identically by the DuckDB oracle
    * (`('0x'||substr(md5('hp:t:p:j'),1,8))::BIGINT / 2^32 - 0.5`).
    */
  def portablePlaneComponent(table: Int, p: Int, j: Int): Double =
    java.lang.Long.parseLong(
      Hashing.md5Hex(s"hp:$table:$p:$j").substring(0, 8), 16).toDouble /
      4294967296.0 - 0.5

  /** Signature for one hash table, PURE CATALYST: the planes are
    * literal arrays (constants — md5-derived, so the oracle states the
    * same numbers), projections are sequential folds (bit-for-bit
    * reproducible across engines: identical products, identical
    * summation order), bits are sign tests.
    */
  def portableSig(vec: Column, dim: Int, bits: Int, table: Int): Column =
    (0 until bits).map { p =>
      val plane = typedLit(Array.tabulate(dim)(j => portablePlaneComponent(table, p, j)))
      // float element widens, DOUBLE multiply, DOUBLE accumulate —
      // exactly zip_with(vec, plane, _*_) folded with +, but codegen'd
      // (bits × tables HOF aggregates per row were all interpreted)
      val proj = graft.plans.VectorExprs.float_double_dot(vec, plane)
      when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** All `tables` portable signatures from ONE scan: the table id is
    * exploded FIRST and each row's bucket evaluates `bits` dot
    * products against planes looked up (by table) from one literal
    * array-of-planes — so a single small codegen'd projection serves
    * every table. The previous per-table unionByName re-scanned the
    * input `tables` times and compiled `tables` separate codegen
    * stages of `bits` dot products each (guide §2.4; the dominant cost
    * of a cold run was that compilation). Row set and bucket values
    * are identical: same [[portablePlaneComponent]] literals through
    * the same [[graft.plans.FloatDoubleDot]] fold.
    */
  private def bucketedPortable(df: DataFrame, idName: String, vecName: String,
                               dim: Int, bits: Int, tables: Int): DataFrame = {
    val planes: Seq[Seq[Double]] = (0 until tables).flatMap(t =>
      (0 until bits).map(p =>
        (0 until dim).map(j => portablePlaneComponent(t, p, j)).toSeq))
    val planesLit = typedLit(planes)
    val sig = (0 until bits).map { p =>
      val proj = graft.plans.VectorExprs.float_double_dot(col(vecName),
        element_at(planesLit, col("table") * bits + p + 1))
      when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.select(col("id").as(idName), col("vec").as(vecName),
        explode(sequence(lit(0), lit(tables - 1))).as("table"))
      .select(col(idName), col(vecName), col("table"), sig.as("bucket"))
  }

  /** [[lshTopK]] over the portable signatures — same bucket-join +
    * exact-rerank shape, every step oracle-checkable. The xxhash
    * variant stays as the throughput path.
    */
  def lshTopKPortable(queries: DataFrame, corpus: DataFrame, k: Int,
                      dim: Int, bits: Int = 10, tables: Int = 6): DataFrame = {
    def bucketed(df: DataFrame, idName: String, vecName: String): DataFrame =
      bucketedPortable(df, idName, vecName, dim, bits, tables)
    val qb = bucketed(queries, "query_id", "qvec")
    val cb = bucketed(corpus, "neighbor_id", "cvec")
    // The exact rerank cosine is computed BEFORE the candidate dedup
    // and the vec arrays are dropped at the join's projection: the
    // (query, neighbor) pair fully determines the cosine (same two
    // vectors through the same sequential fold), so deduplicating
    // (ids, cosine) rows is result-identical to deduplicating vec
    // rows — and the dedup exchange now carries three scalars instead
    // of two dim-length float arrays (guide §2.3/§8: every shuffle
    // but the payload-bearing one moves a lightweight proxy). It also
    // turns the dedup from a Sort+SortAggregate (First over an array
    // is not a mutable aggregate buffer, so Spark falls back to the
    // sort-based aggregate) into a map-side-combinable hash
    // aggregate. Cost: a duplicate candidate (≤ `tables` copies per
    // pair) evaluates its dot product once per copy instead of once
    // per pair — dim multiply-adds in a generated loop, strictly
    // cheaper than sort-shuffling the arrays those copies carried.
    val candidates = qb.join(cb, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** [[cosineDupPairs]] over the portable signatures. */
  def cosineDupPairsPortable(df: DataFrame, threshold: Double, dim: Int,
                             bits: Int = 8, tables: Int = 6): DataFrame = {
    def bucketed(idName: String, vecName: String): DataFrame =
      bucketedPortable(df, idName, vecName, dim, bits, tables)
    // cosine AND the threshold filter run BEFORE the pair dedup (see
    // [[lshTopKPortable]]): the pair determines the cosine, so
    // filter∘dedup ≡ dedup∘filter — and pushing the filter below the
    // dedup exchange drops every below-threshold candidate before it
    // is shuffled at all (guide §2.3), while the dedup itself moves
    // (long, long, double) rows instead of two float arrays.
    bucketed("id_a", "vec_a").join(bucketed("id_b", "vec_b"), Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs (cosine ≥ threshold),
    * LSH-bucketed (id_a < id_b).
    */
  def cosineDupPairs(df: DataFrame, threshold: Double, dim: Int,
                     bits: Int = 10, tables: Int = 4): DataFrame = {
    def bucketed(idName: String, vecName: String): DataFrame = {
      val perTable = (0 until tables).map { t =>
        df.select(col("id").as(idName), col("vec").as(vecName),
          lit(t).as("table"),
          hyperplaneSigUdf(bits, dim, t)(col("vec")).as("bucket"))
      }
      perTable.reduce(_ unionByName _)
    }
    // same scalar-proxy dedup as [[cosineDupPairsPortable]]
    bucketed("id_a", "vec_a").join(bucketed("id_b", "vec_b"), Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "cosine")
  }

  /** SemDedup (Abbas et al. 2023, "SemDeDup", public): semantic
    * near-duplicate REMOVAL — cluster the embedding space with the
    * portable IVF k-means ([[IvfIndex.trainPortable]]), then inside
    * each cluster drop every document whose cosine to a LOWER-id
    * cluster-mate reaches `tau` (keep-first, deterministic). Unlike
    * [[cosineDupPairs]] (which REPORTS near-dup pairs), this emits the
    * keep/drop decision a pipeline acts on, and unlike MinHash it
    * catches paraphrases — text that shares meaning, not shingles.
    *
    * Scale shape at 10^10 docs: train touches k×dim driver state only;
    * assign is one map over the corpus; the pair stage is an EQUI-join
    * on cluster id (never corpus²) — cost Σ|cluster|², the SemDedup
    * trade, bounded by choosing k ∝ corpus size so clusters stay
    * ~constant-sized. Keep/drop needs no iteration: "dominated by any
    * lower id" is a single aggregate over pairs, unlike transitive-
    * closure dedup ([[Dedup]] CC) — SemDedup's published semantics.
    *
    * Every arithmetic step is the oracle-proven portable kind
    * (fixed-point integer k-means; sequential-fold float cosine), so
    * the whole operator is statable as one SQL oracle.
    *
    * Returns (id, cluster, kept) for every corpus row.
    */
  def semDedup(spark: org.apache.spark.sql.SparkSession, corpus: DataFrame,
               k: Int, iterations: Int, tau: Double,
               reliableCheckpoints: Boolean = false,
               materialize: Option[DataFrame => DataFrame] = None)
      : DataFrame = {
    val cents = IvfIndex.trainPortable(spark, corpus, k, iterations)
    // materialize the assignment ONCE: it feeds both self-join sides
    // and the final verdict join — unmaterialized, Spark re-evaluates
    // the k-way nearest-centroid expression three times over the
    // corpus (measured 10.2 s -> 4 s at sf0.1). At production scale
    // the assignment is written to a table before the pair stage (the
    // published SemDeDup recipe does exactly this). The in-session
    // analogs mirror [[graft.operators.Dedup.connectedMinLabels]]'
    // EXPLICIT choice: `reliableCheckpoints=true` pins it via
    // `checkpoint()` to the SparkContext's checkpoint dir (DFS on a
    // cluster — the lost-executor-safe path; caller must
    // `sc.setCheckpointDir` first), the default is the local[*]-only
    // `localCheckpoint` fast path, and `materialize` overrides both
    // (e.g. a table write+read).
    val mat: DataFrame => DataFrame = materialize.getOrElse {
      if (reliableCheckpoints) { d =>
        require(d.sparkSession.sparkContext.getCheckpointDir.isDefined,
          "reliableCheckpoints=true requires sc.setCheckpointDir (a DFS path on a cluster)")
        d.checkpoint(eager = true)
      } else (_: DataFrame).localCheckpoint(true)
    }
    val assigned = mat(IvfIndex.assignPortable(corpus, cents)
      .select(col("id"), col("vec"), col("cluster")))
    val dropped = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .filter(cosine(col("a.vec"), col("b.vec")) >= tau)
      .select(col("b.id").as("id")).distinct()
    assigned.join(dropped.withColumn("dropped", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster"),
        not(coalesce(col("dropped"), lit(false))).as("kept"))
  }
}
