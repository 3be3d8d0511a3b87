package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-curation operators beyond filtering/dedup: deterministic
  * stratified sampling and domain-level (source-level) gating — the
  * two corpus-shaping passes a training-data pipeline runs after
  * per-document quality is known.
  */
object Curation {

  /** Deterministic stratified downsampling: a document survives iff
    * `portableHash(salt ':' id) % 10000 < rateBp(stratum)` — per-
    * stratum basis-point rates as a literal map (the data-mixture
    * knob: e.g. downweight over-represented languages). No RNG state,
    * no `rand()`: the SAME rows survive at any partitioning, executor
    * count, retry or resume — the property a 100 TB sampling pass
    * needs (a task retry with `rand()` silently changes the sample).
    * Pure Catalyst map: fuses with the scan, no shuffle.
    */
  def stratifiedKeep(idCol: Column, stratum: Column,
                     ratesBp: Map[String, Int], defaultBp: Int,
                     salt: String = "samp"): Column = {
    val bucket = TextAnalysis.portableHash(
      concat(lit(s"$salt:"), idCol.cast("string"))) % 10000
    val rate = coalesce(element_at(typedLit(ratesBp), stratum), lit(defaultBp))
    bucket < rate
  }

  /** Domain-level quality gate (the RefinedWeb / CCNet "URL and
    * domain-level filtering" stage, public): aggregate a per-document
    * integer quality score to its domain (source), block domains whose
    * TOTAL score is negative, and join the verdict back to every
    * document. Exact integer sums — the verdict is bit-reproducible
    * and order-independent.
    *
    * Scale shape at 10^10 docs: one source-keyed aggregate with
    * map-side partial combine (domains collapse early), then a
    * source-keyed join of the verdict dimension back to the corpus.
    * The domain dimension is UNBOUNDED on web text (one row per
    * registered domain), so it is never hinted broadcast — AQE may
    * still pick broadcast when the observed size is small, which is
    * right at small scale and impossible at 10^10 (same reasoning as
    * [[graft.functions.TextAnalysis.topTerms]]).
    *
    * Returns one row per doc: (idCol, sourceCol, source_score_sum,
    * source_n_docs, source_blocked).
    */
  def domainGate(df: DataFrame, idCol: String, sourceCol: String,
                 scoreCol: Column): DataFrame = {
    val scored = df.select(col(idCol), col(sourceCol),
      scoreCol.cast("long").as("doc_score"))
    val verdict = scored.groupBy(col(sourceCol))
      .agg(sum(col("doc_score")).as("source_score_sum"),
        count(lit(1)).as("source_n_docs"))
      .withColumn("source_blocked", col("source_score_sum") < 0)
    scored.select(col(idCol), col(sourceCol))
      .join(verdict, Seq(sourceCol))
      .select(col(idCol), col(sourceCol), col("source_score_sum"),
        col("source_n_docs"), col("source_blocked"))
  }
}
