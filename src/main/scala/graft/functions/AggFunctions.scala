package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent floating-point aggregates.
  *
  * Double `sum()` results depend on the order partial aggregates merge in, so
  * the same query can yield last-bit-different results between runs, between
  * partition counts, and between engines. For any result that must
  * hash-match an external oracle (or simply be reproducible across cluster
  * sizes — a 100 TB job re-run on different executor counts should produce
  * the identical answer), we accumulate in DECIMAL: decimal addition is
  * exact, hence associative, hence order-independent. The final cast back to
  * double is a single deterministic rounding.
  *
  * Cost note: decimal hash-aggregation is ~2x a double sum but stays inside
  * whole-stage codegen with map-side partial aggregation, so the shuffle
  * profile is identical to a plain `sum`.
  */
object AggFunctions {

  /** Exact sum of a double column, returned as double.
    * @param scale decimal digits kept per value — 4 covers the harness data
    *              (2-decimal money / metric values) with headroom.
    */
  def sumExact(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double")

  /** Exact mean: exact decimal sum over a bigint count — both operands are
    * bit-deterministic, so the double division is too. Null-skipping count
    * matches SQL AVG semantics. */
  def avgExact(c: Column, scale: Int = 4): Column =
    sumExact(c, scale) / count(c)

  /** SCALE-TIER percentile: `approx_percentile` (GK sketch). The exact
    * `percentile` aggregate materializes every group's values in its
    * aggregation buffer — at 100 TB with billions of rows per group that is
    * an executor-memory cliff — while the sketch is O(1/accuracy) memory
    * per group and merges associatively, so it is the only percentile that
    * survives arbitrary group sizes. Error bound: rank error ≤
    * groupSize/accuracy. Keep the exact form where oracle bit-parity is
    * required (catalog q37); use this tier for production-scale rollups
    * (catalog q41). */
  def percentileApprox(c: Column, p: Double, accuracy: Int = 10000): Column =
    approx_percentile(c, lit(p), lit(accuracy))

  /** Deterministic sample standard deviation via the sum-of-squares
    * identity, with both sums accumulated exactly. The closed-form double
    * arithmetic is evaluated in a fixed operation order, so results are
    * bit-stable (unlike `stddev_samp`, which merges partial moments in
    * shuffle order).
    *
    * The squared sum runs in INTEGER UNITS: quantized values ×10^scale are
    * exactly integral (no rounding — Spark's decimal downcast rounds
    * HALF_UP while DuckDB's truncates, so any mid-pipeline re-quantization
    * diverges cross-engine), their squares sum exactly in DECIMAL(38,0),
    * and the sum is truncated back to WHOLE squared units before the
    * double conversion. Kept at fractional scale the exact sum exceeds
    * double's 53-bit exact range by sf0.1 and the engines' DECIMAL→DOUBLE
    * conversions round it differently (observed 1-ulp std drift); the
    * truncated integer part stays exactly representable to Σc² < 2^53. */
  def stddevExact(c: Column, scale: Int = 4): Column = {
    val n = count(c).cast("double")
    val s = sumExact(c, scale)
    val unit = math.pow(10, scale).toLong
    val r = unit * unit
    val u = (c.cast(DecimalType(18, scale)) * unit).cast(DecimalType(18, 0))
    val ssu = sum(u * u) // exact, units of 10^(-2·scale)
    // subtract the remainder first so the division is exactly integral —
    // a direct decimal divide rounds at the result scale in Spark
    val ss = ((ssu - pmod(ssu, lit(r))) / lit(r)).cast("double")
    sqrt((ss - s * s / n) / (n - lit(1.0)))
  }
}
