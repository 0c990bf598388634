package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.AggFunctions

/** Structured-Streaming upgrade of the reference's incremental structure
  * (SURVEY.md §2.12): the reference processes chronologically-ordered
  * day-files with load-once guards — exactly a file-source stream — and its
  * `v_hourly_traffic` view is a tumbling 1-hour window.
  *
  * `hourlyWindow` works on any streaming (or batch) frame: watermarked
  * event-time tumbling window + per-key sums. With the file source +
  * checkpointing this gives exactly-once-per-file semantics, replacing the
  * reference's count-guard idempotency (K4) with engine-managed state.
  */
object StreamingRollup {

  /** Tumbling 1-hour event-time rollup with late-data watermark.
    *
    * @param df        streaming frame with `tsCol` event time
    * @param watermark e.g. "2 hours" — late rows beyond this are dropped
    *                  (the batch reference has no late-data policy; it
    *                  re-reads whole files, so batch remains the
    *                  correctness source of truth)
    */
  def hourlyWindow(
      df: DataFrame,
      tsCol: String,
      keys: Seq[String],
      valueCol: String,
      watermark: String = "2 hours"
  ): DataFrame = {
    val groupCols = window(col(tsCol), "1 hour") +: keys.map(col)
    df.withWatermark(tsCol, watermark)
      .groupBy(groupCols: _*)
      .agg(
        count(lit(1)).as("n_events"),
        AggFunctions.sumExact(col(valueCol)).as("total_value")
      )
      .select(
        col("window.start").as("hour") +: (keys.map(col) :+ col("n_events") :+ col("total_value")): _*
      )
  }

  /** Gap-based sessions via Spark's BUILT-IN `session_window` — the
    * watermark-managed sibling of
    * [[StreamingSessionize]]'s flatMapGroupsWithState form. Use this one
    * when per-session logic is a plain aggregation (state handled entirely
    * by the engine: a session closes once the watermark passes its end);
    * use the custom-state form when the session needs bespoke
    * accumulators or emission timing. Works identically on batch frames
    * (no watermark state — pure event-time grouping).
    */
  def sessionWindow(
      df: DataFrame,
      tsCol: String,
      keys: Seq[String],
      gap: String,
      watermark: String = "2 hours"
  ): DataFrame = {
    // Spark rejects GLOBAL session-window aggregation on streams at
    // runtime; require the key up front so the failure is immediate.
    require(keys.nonEmpty,
      "session_window streaming aggregation needs at least one grouping key")
    val groupCols = session_window(col(tsCol), gap) +: keys.map(col)
    df.withWatermark(tsCol, watermark)
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_events"))
      .select(
        keys.map(col) :+
          col("session_window.start").as("session_start") :+
          col("session_window.end").as("session_end") :+
          col("n_events"): _*
      )
  }
}
