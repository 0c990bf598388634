package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Deterministic hash-based sampling — the reproducible alternative to
  * `df.sample()` for training-data curation.
  *
  * `rand()`-based sampling is non-reproducible across retries, partitionings,
  * and cluster sizes; at 100 TB a re-run of a failed stage would silently
  * change the corpus. Keying the keep/drop decision on a splitmix64 hash of
  * a stable row id makes the sample a pure function of the data: map-only
  * (no shuffle, no state), resumable, and consistent across engines — the
  * DuckDB oracle replays the identical hash.
  */
object Sampling {

  /** Keep/drop granularity: 1e6 buckets → rates are exact to 1e-6. */
  val Buckets = 1000000L

  /** Uniform bucket in [0, Buckets) from the salted splitmix64 of `id`.
    * Salting decorrelates independent samples drawn from the same ids
    * (train/validation splits, repeated experiments). */
  def hashBucket(id: Column, salt: Long): Column =
    pmod(HashFunctions.seeded(id.cast("long"), lit(salt)), lit(Buckets))

  /** Bernoulli sample at `fraction`, deterministic in (`idCol`, `salt`). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double, salt: Long = 0L): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < lit(math.round(fraction * Buckets)))

  /** Stratified sample: per-stratum rates from `fractions` (strata absent
    * from the map fall back to `default`). The standard corpus-rebalancing
    * shape — e.g. downsample an over-represented language while keeping the
    * tail at full rate. Still map-only: the stratum rate is a row-local
    * CASE, not a join. */
  def stratifiedHashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      default: Double,
      salt: Long = 0L): DataFrame = {
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(lit(math.round(default * Buckets))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(math.round(f * Buckets))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < threshold)
  }

  /** Rebalance to the smallest group: downsample every `groupCol` group to
    * (approximately) the size of the smallest one, deterministically.
    * Unlike [[stratifiedHashSample]], the per-group rates are DERIVED FROM
    * THE DATA (count aggregation) rather than supplied — the "flatten the
    * source/language mix" pass a curation pipeline runs after measuring
    * the corpus.
    *
    * A row survives iff  bucket(id) · count(group) < Buckets · min_count —
    * pure integer arithmetic (no rate rounding), so engines agree exactly.
    * (The product stays in BIGINT up to ~9e12-row groups.)
    *
    * Scale shape: the per-group count table has one row per group — it and
    * the 1-row global min are broadcast back into a map-only filter. The
    * data itself never shuffles, so group skew (the very thing being
    * corrected) cannot skew the job. */
  def rebalanceToSmallest(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      salt: Long = 0L): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
    val target = counts.agg(min(col("__cnt")).as("__target"))
    df.join(broadcast(counts), Seq(groupCol))
      .crossJoin(broadcast(target))
      .filter(hashBucket(col(idCol), salt) * col("__cnt") < lit(Buckets) * col("__target"))
      .drop("__cnt", "__target")
  }

  /** Downsample to a TARGET MIXTURE: keep per-group fractions so the
    * surviving corpus matches the given integer weight proportions as
    * closely as possible WITHOUT upsampling any group — the data-mixing
    * step of a training pipeline ("x% web, y% code, z% reference").
    *
    * The binding group (the one whose data runs out first relative to its
    * weight) is kept whole; every other group downsamples to match. With
    * `L = lcm(weights)` the binding scale is `M = min_g(n_g * L / w_g)`
    * (exactly integral) and a row of group g survives iff
    * `hash_bucket * L * n_g < Buckets * w_g * M` — pure integer
    * arithmetic, so survival is deterministic across engines, runs, and
    * partitionings, and re-running after an append keeps a superset of the
    * previous sample (hash thresholds only move). Groups without a weight
    * are dropped (the join is the filter).
    *
    * Plan: counts aggregate + two broadcasts + map-only filter; the corpus
    * itself never shuffles — the skew being corrected cannot skew the job.
    */
  def rebalanceToTarget(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      weights: Map[String, Long],
      salt: Long = 0L): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcm = weights.values.foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    val spark = df.sparkSession
    import spark.implicits._
    // lw = lcm / w computed on the DRIVER as an exact Long (lcm % w == 0 by
    // construction): the Column form `lit(lcm) / col(w)` is fractional
    // division, which would make __lw — and everything derived from it —
    // DoubleType and silently demote the survival inequality below to
    // double past 2^53.
    val wdf = weights.toSeq.map { case (g, w) => (g, w, lcm / w) }
      .toDF(groupCol, "__w", "__lw")
    val counts = df.join(broadcast(wdf), Seq(groupCol))
      .groupBy(col(groupCol), col("__w"), col("__lw"))
      .agg(count(lit(1)).as("__cnt"))
    // __m stays decimal(38,0): cnt * lw overflows Long at the 1e10-row /
    // large-lcm scale this operator claims to handle.
    val binding = counts.agg(
      min(col("__cnt").cast("decimal(38,0)") * col("__lw").cast("decimal(38,0)")).as("__m"))
    df.join(broadcast(counts.select(col(groupCol), col("__w"), col("__cnt"))), Seq(groupCol))
      .crossJoin(broadcast(binding))
      .filter(
        // decimal(38,0) comparison: at 1e10-row groups with large weight
        // lcms the 64-bit products overflow; exact decimals never do
        hashBucket(col(idCol), salt).cast("decimal(38,0)") * lit(lcm) * col("__cnt") <
          lit(Buckets).cast("decimal(38,0)") * col("__w") * col("__m"))
      .drop("__w", "__cnt", "__m")
  }
}
