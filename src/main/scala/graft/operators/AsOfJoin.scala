package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the time-series enrichment operator
  * (trades←quotes, events←latest-state) that Spark's built-in join surface
  * lacks.
  *
  * The naive encodings both die at scale: a range-condition join degenerates
  * into a per-key cross product (quadratic pair blowup before the "latest"
  * filter), and per-key collects are driver-bound. This is the merge-join
  * form instead: tag both sides, union, ONE hash shuffle on the key, one
  * per-partition sort on (ts, side), and a running `last(_, ignoreNulls)`
  * window carries the latest right payload forward into each left row —
  * O(n log n) per key, zero pair materialization, and skew is bounded by
  * per-key row counts (AQE-manageable), not their squares.
  */
object AsOfJoin {

  /** For each `left` row, attach the latest `right` row with
    * `right(rightTs) <= left(leftTs)` for the same `key`.
    *
    * Right rows sort BEFORE left rows at equal timestamps, so an exactly
    * concurrent right row matches (the ASOF `>=` bound). If the right side
    * can hold several rows per (key, ts), pre-reduce it (e.g. `max_by`)
    * first — which tied row wins is otherwise plan-dependent.
    *
    * Output: every `left` column, then `asof_ts` (the matched right
    * timestamp) and one `asof_<c>` per payload column — all null when the
    * key has no prior right row.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val outNames = "asof_ts" +: payload.map(c => s"asof_$c")
    val clash = left.columns.toSeq.intersect(outNames)
    require(clash.isEmpty,
      s"asOfJoin output columns ${clash.mkString(", ")} collide with left-side " +
        "columns; rename the left columns (the appended asof_* names are fixed)")
    val lStruct = struct(left.columns.toSeq.map(col): _*)
    val rStruct = struct(
      col(rightTs).as("asof_ts") +: payload.map(c => col(c).as(s"asof_$c")): _*)
    // Concrete struct types for the null slots of the other side's payload —
    // unionByName needs both legs fully typed.
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))
    val w = Window
      .partitionBy("__k")
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols =
      col("__l.*") +:
        (col("__m.asof_ts").as("asof_ts") +:
          payload.map(c => col(s"__m.asof_$c").as(s"asof_$c")))
    r.unionByName(l)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(outCols: _*)
  }
}
