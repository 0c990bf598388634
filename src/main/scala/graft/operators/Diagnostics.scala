package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Distribution drift between two snapshots — the "did this month's crawl
    * shift under me" audit a training-data pipeline runs before mixing a
    * new snapshot in. Per group, a binned two-sample Kolmogorov-Smirnov
    * distance: `max_bin |cdfA - cdfB|`, kept EXACT by cross-multiplying —
    * the numerator `max |cumA·nB - cumB·nA|` is pure integer arithmetic
    * (decimal(38,0): billion-row sides overflow BIGINT products), so two
    * engines and any partitioning agree bit-for-bit; the final
    * `ks_stat = num / (nA·nB)` is one correctly-rounded double division of
    * values exact below 2^53.
    *
    * Values bin by `least(bins-1, greatest(0, floor(((v - lo) / (hi - lo))
    * · bins)))` — fixed literal edges, so binning is reproducible and the
    * operation order is replayable in SQL verbatim.
    *
    * Scale shape: ONE map-side-combined aggregation over the tagged union
    * (shuffle keyed (group, bin), carrying ≤ groups × bins rows regardless
    * of input size), then windows + the final max over that bounded table.
    * No join of the two sides; the corpus rows are read once each.
    * Groups present on only one side are dropped (KS against an empty
    * sample is undefined); emits `(groupCols*, n_a, n_b, ks_num, ks_stat)`.
    */
  def ksDrift(
      dfA: DataFrame,
      dfB: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      bins: Int,
      lo: Double,
      hi: Double): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    require(hi > lo, s"empty value range [$lo, $hi]")
    val g = groupCols.map(col)
    def side(df: DataFrame, tag: Int): DataFrame =
      df.select(g :+ valueCol.cast("double").as("__v"): _*).withColumn("__side", lit(tag))
    val binExpr = least(lit(bins - 1), greatest(lit(0),
      floor((col("__v") - lit(lo)) / lit(hi - lo) * lit(bins)).cast("int")))
    val counts = side(dfA, 0).unionByName(side(dfB, 1))
      .withColumn("__bin", binExpr)
      .groupBy(g :+ col("__bin"): _*)
      .agg(
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__cb"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    counts
      .withColumn("__cuma", sum(col("__ca")).over(wCum))
      .withColumn("__cumb", sum(col("__cb")).over(wCum))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
      .groupBy(g: _*)
      .agg(
        max(col("__na")).as("n_a"),
        max(col("__nb")).as("n_b"),
        max(abs(col("__cuma").cast("decimal(19,0)") * col("__nb") -
          col("__cumb").cast("decimal(19,0)") * col("__na")))
          .cast("decimal(38,0)").as("ks_num"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("ks_stat",
        col("ks_num").cast("double") / (col("n_a").cast("double") * col("n_b").cast("double")))
  }
}
