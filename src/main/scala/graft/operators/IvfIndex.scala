package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Hashing

/** IVF (inverted-file) approximate nearest neighbor — the coarse-
  * quantizer scale path next to [[Similarity.lshTopK]]:
  *
  *  1. train k centroids with a few Lloyd iterations, fully as
  *     DataFrame aggregations (posexplode → per-dimension mean);
  *     deterministic init (the k corpus rows with smallest
  *     xxhash64(id) — no RNG state, replays identically);
  *  2. assign every corpus vector to its nearest centroid (one narrow
  *     cluster-id column — the inverted file);
  *  3. query: probe the `nprobe` nearest centroid lists only, exact
  *     cosine rerank inside them.
  *
  * At 10^10 vectors the assign pass is one map over the corpus and
  * the probe join touches nprobe/k of it — the classic IVF trade.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Float]]) extends Serializable

  private def l2Udf(centroids: Array[Array[Float]]) = udf { (vec: Array[Float]) =>
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      var d = 0.0
      val n = math.min(vec.length, cen.length)
      var j = 0
      while (j < n) { val t = vec(j) - cen(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Deterministic k-means over (id, vec). */
  def train(spark: SparkSession, corpus: DataFrame, k: Int,
            iterations: Int = 3): Model = {
    import spark.implicits._
    // deterministic seed pick: k rows with smallest xxhash64(id)
    var centroids: Array[Array[Float]] = corpus
      .select(col("id"), col("vec"))
      .withColumn("h", xxhash64(col("id")))
      .orderBy("h")
      .limit(k)
      .select("vec").as[Array[Float]].collect()

    (0 until iterations).foreach { _ =>
      val assigned = corpus.select(col("vec"),
        l2Udf(centroids)(col("vec")).as("cluster"))
      val means = assigned
        .select(col("cluster"), posexplode(col("vec")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(avg(col("v")).as("m"))
        .collect()
      val dim = centroids.head.length
      val next = centroids.map(_.clone())
      means.foreach { r =>
        val c = r.getInt(0)
        val p = r.getInt(1)
        if (c < next.length && p < dim) next(c)(p) = r.getDouble(2).toFloat
      }
      centroids = next
    }
    Model(centroids)
  }

  /** Corpus with its inverted-file cluster column. */
  def assign(corpus: DataFrame, model: Model): DataFrame =
    corpus.withColumn("cluster", l2Udf(model.centroids)(col("vec")))

  /** `nprobe` nearest centroid ids per query vector. */
  private def probesUdf(model: Model, nprobe: Int) = udf { (vec: Array[Float]) =>
    model.centroids.indices.map { c =>
      val cen = model.centroids(c)
      var d = 0.0
      val n = math.min(vec.length, cen.length)
      var j = 0
      while (j < n) { val t = vec(j) - cen(j); d += t * t; j += 1 }
      (d, c)
    }.sorted.take(nprobe).map(_._2).toArray
  }

  // ---------- SQL-portable twin (round-3 item #4) ----------
  //
  // The float k-means above is NOT cross-engine reproducible: double
  // means depend on summation order. The portable twin quantizes
  // vectors to fixed-point BIGINTs (floor(x·10⁴ + 0.5) — exact in
  // doubles, identical everywhere), so sums/distances are exact
  // integers (order-independent), centroid components are
  // floor(sum/count) (exact), argmin ties break by cluster id, and the
  // ONLY floats left are the final rerank cosines — the same
  // sequential-fold double arithmetic the oracle-green LSH path
  // already proved matches DuckDB's list_dot_product bit-for-bit. The
  // whole train → assign → probe → rerank pipeline is therefore
  // statable (unrolled) as one SQL oracle.

  /** Fixed-point scale: 4 decimal digits. */
  val QScale = 10000.0

  /** vec (array<float>) → quantized array<long>, exact both engines. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * QScale + 0.5d).cast("long"))

  /** Exact integer L2² between a quantized column and a literal
    * centroid (overflow-safe: |q| ≤ ~10⁵ ⇒ Σ diff² ≤ 2.6·10¹² « 2⁶³).
    * Codegen'd expression ([[graft.plans.LongSqDist]]) — the HOF fold
    * form is CodegenFallback, and k of these run per row.
    */
  private def qDist(qv: Column, cent: Array[Long]): Column =
    graft.plans.VectorExprs.long_sqdist(qv, typedLit(cent.toSeq))

  /** argmin over literal centroids, ties to the smallest cluster id
    * (lexicographic array_min over (dist, cid) structs — one codegen'd
    * expression, no join).
    */
  private def nearestCid(qv: Column, cents: Array[Array[Long]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(qDist(qv, c).as("d"), lit(i).as("cid"))
    }: _*)).getField("cid")

  /** Deterministic portable k-means over (id, vec): seeds = the k rows
    * with smallest (portableHash("seed:" + id), id); each Lloyd round
    * assigns by exact integer distance and recomputes centroid
    * components as floor(Σq / n) via one posexplode aggregate. Empty
    * clusters keep their previous centroid. Driver state is k×dim
    * longs — nothing data-sized ever collects.
    */
  def trainPortable(spark: SparkSession, corpus: DataFrame, k: Int,
                    iterations: Int = 2): Array[Array[Long]] = {
    import spark.implicits._
    val qv = corpus.select(col("id"), quantize(col("vec")).as("qv"))
    var cents: Array[Array[Long]] = qv
      .withColumn("ph", graft.functions.TextAnalysis.portableHash(
        concat(lit("seed:"), col("id").cast("string"))))
      .orderBy(col("ph").asc, col("id").asc).limit(k)
      .select("qv").as[Array[Long]].collect()
    (0 until iterations).foreach { _ =>
      val sums = qv
        .withColumn("cid", nearestCid(col("qv"), cents))
        .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("m"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getLong(2))
      cents = next
    }
    cents
  }

  /** Corpus with its portable inverted-file cluster column. */
  def assignPortable(corpus: DataFrame, cents: Array[Array[Long]]): DataFrame =
    corpus.withColumn("cluster", nearestCid(quantize(col("vec")), cents))

  /** Portable probe + exact cosine rerank: nprobe nearest centroids by
    * integer distance (ties to smaller cid), candidates from those
    * inverted lists only (each corpus vector lives in exactly ONE list,
    * so no candidate dedup is needed), float cosine rerank.
    */
  def topKPortable(queries: DataFrame, corpusAssigned: DataFrame,
                   cents: Array[Array[Long]], k: Int, nprobe: Int): DataFrame = {
    val probeStructs = array(cents.zipWithIndex.map { case (c, i) =>
      struct(qDist(quantize(col("vec")), c).as("d"), lit(i).as("cid"))
    }: _*)
    val q = queries
      .select(col("id").as("query_id"), col("vec").as("qvec"),
        explode(transform(slice(sort_array(probeStructs), 1, nprobe),
          s => s.getField("cid"))).as("cluster"))
    val c = corpusAssigned.select(col("id").as("neighbor_id"),
      col("vec").as("cvec"), col("cluster"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    q.join(c, Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.cosine(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Approximate cosine top-k: probe nprobe lists, exact rerank. */
  def topK(queries: DataFrame, corpusAssigned: DataFrame, model: Model,
           k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qvec"),
      explode(probesUdf(model, nprobe)(col("vec"))).as("cluster"))
    val c = corpusAssigned.select(col("id").as("neighbor_id"),
      col("vec").as("cvec"), col("cluster"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    q.join(c, Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.cosine(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
