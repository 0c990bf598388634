package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-linkage scoring (Fellegi–Sunter shape): combine per-field
  * agreement verdicts on CANDIDATE pairs into one additive match weight.
  * The probabilistic formulation sums log-odds per field; here the
  * weights are fixed integer milli-units supplied by the caller (learned
  * offline or hand-set), so the composite score is exact integer
  * arithmetic — rankable, thresholdable, and bit-identical across
  * engines — rather than a sum of libm logs.
  *
  * The operator scores PAIRS, it does not generate them: candidate
  * generation is the blocking tier's job ([[Dedup.editOnePairs]] for
  * name variants, [[Dedup.minHashLshPairs]] for content), which is what
  * keeps the scored set collision-sized instead of n². Scoring itself is
  * row-local — one projection over the pair table, no shuffle.
  */
object Linkage {

  /** One field comparison: `agree` is evaluated against the pair row
    * (both sides' attributes already joined on); agreement adds
    * `wAgree`, disagreement adds `wDisagree` (conventionally negative). */
  final case class FieldRule(name: String, agree: Column, wAgree: Long, wDisagree: Long)

  /** Add `score` = Σ per-rule weight to a candidate-pair DataFrame. */
  def score(pairs: DataFrame, rules: Seq[FieldRule]): DataFrame = {
    require(rules.nonEmpty, "linkage scoring needs at least one field rule")
    val total = rules
      .map(r => when(r.agree, lit(r.wAgree)).otherwise(lit(r.wDisagree)))
      .reduce(_ + _)
    pairs.withColumn("score", total)
  }
}
