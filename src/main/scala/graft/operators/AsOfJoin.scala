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

  /** Interval OVERLAP join — the second temporal join Spark's built-in
    * surface lacks (validity windows × validity windows: outages ×
    * sessions, promo windows × orders, SCD2 × SCD2). A naive range
    * condition plans a nested-loop/cartesian and dies quadratically; this
    * is the standard BINNED equi-join form instead: the time line is cut
    * into fixed `binWidthUs` cells, each interval registers in the cells
    * its span touches (`trunc(start/w) .. trunc(end/w)` — a
    * sequence-explode, codegen-friendly), and candidates meet in a pure
    * (keys, cell) hash join, then verify the closed-interval overlap
    * `s1 ≤ e2 ∧ s2 ≤ e1` row-locally.
    *
    * Overlapping intervals share a point, hence share that point's cell —
    * no recall loss for ANY monotone partition of the line. A pair
    * sharing several cells would duplicate, so it is emitted ONLY from
    * its first shared cell (`cell = max(cellOf(s1), cellOf(s2))` — a
    * row-local predicate), which dedups without a distinct shuffle.
    *
    * Choose `binWidthUs` near the TYPICAL interval length: fan-out per
    * row is `span/width + 1` cells (too narrow explodes the index; too
    * wide piles unrelated intervals into one cell — the same tuning as
    * every spatial grid here, see [[graft.operators.Spatial]]). Shuffle
    * is cells-registered-sized; nothing is ever left × right.
    *
    * `left`/`right` columns pass through (aside from the shared `keys`,
    * names must not collide — alias first). Timestamps are integer
    * microseconds end-to-end; closed intervals, `start ≤ end` required
    * at runtime (a reversed interval silently matches nothing under
    * verify — fail it loudly instead). `keys` may be empty (pure
    * temporal join): the cells alone then carry the join, with the skew
    * caveat that implies. */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      binWidthUs: Long): DataFrame = {
    require(binWidthUs > 0, s"binWidthUs must be positive, got $binWidthUs")
    def cells(df: DataFrame, s: String, e: String): DataFrame = {
      // cast: parquet NTZ timestamps must pass through the session zone
      // (UTC here) before unix_micros, which requires the TZ type
      val su = unix_micros(col(s).cast("timestamp"))
      val eu = unix_micros(col(e).cast("timestamp"))
      df
        .withColumn("__chk",
          when(su > eu, raise_error(lit(
            s"intervalOverlapJoin: reversed interval ($s > $e)"))).otherwise(lit(0)))
        .withColumn("__su", su)
        .withColumn("__eu", eu)
        .withColumn("__cell",
          explode(sequence(expr(s"__su div $binWidthUs"),
            expr(s"__eu div $binWidthUs"))))
        .drop("__chk")
    }
    val l = cells(left, lStart, lEnd).as("l")
    val r = cells(right, rStart, rEnd).as("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k"))
    val cond = (keyCond :+
      (col("l.__cell") === col("r.__cell")) :+
      (col("l.__su") <= col("r.__eu")) :+
      (col("r.__su") <= col("l.__eu")) :+
      // first-shared-cell emit: dedups multi-cell pairs row-locally
      (col("l.__cell") ===
        greatest(expr(s"l.__su div $binWidthUs"), expr(s"r.__su div $binWidthUs"))))
      .reduce(_ && _)
    val rightKeep = right.columns.filterNot(keys.contains)
    l.join(r, cond)
      .select(
        keys.map(k => col(s"l.$k")) ++
          left.columns.filterNot(keys.contains).map(c => col(s"l.$c")) ++
          rightKeep.map(c => col(s"r.$c")): _*)
  }
}
