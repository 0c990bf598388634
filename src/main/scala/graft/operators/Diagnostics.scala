package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight diagnostics for 100 TB jobs — operators that answer "is this
  * join/aggregation about to blow up?" from the key distributions alone,
  * BEFORE running the expensive job. The reference's analogue is its
  * monitoring surface (reference `docs/MONITORING.md:93-96` connection/cache
  * SLOs); at Spark scale the thing worth watching is shuffle-key skew.
  */
object Diagnostics {

  /** Join-skew probe: per-key row counts on both sides of a prospective
    * equi-join and the key's output contribution `n_left * n_right`,
    * top-`topN` keys by contribution.
    *
    * The contribution sum IS the exact inner-join output size, computed
    * without running the join: two map-side-combined aggregations (shuffle =
    * distinct keys, not rows) and a join of the two count tables. A key
    * whose product dwarfs the rest is the one that strands a 1000-executor
    * stage on one straggler task — the decision input for salting
    * ([[Rollup.saltedSumCount]]'s trick) or AQE skew-join thresholds.
    */
  def joinSkewProbe(
      left: DataFrame,
      right: DataFrame,
      key: String,
      topN: Int = 20): DataFrame = {
    val l = left.groupBy(col(key)).agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(col(key)).agg(count(lit(1)).as("n_right"))
    l.join(r, Seq(key))
      .withColumn("est_pairs", col("n_left") * col("n_right"))
      .orderBy(col("est_pairs").desc, col(key))
      .limit(topN)
  }
}
