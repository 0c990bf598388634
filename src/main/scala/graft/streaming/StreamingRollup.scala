package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** [[hourlyWindow]] driven through the REAL Structured-Streaming engine:
    * `readStream` file source over the events parquet → watermarked
    * tumbling-window aggregation → checkpointed sink, run to completion
    * with `Trigger.AvailableNow()`. This is the reference's actual
    * incremental shape — chronologically-arriving files with load-once
    * guards (reference `src/etl.py:102-109`) — executed by the engine's
    * own file tracking + state store instead of hand-rolled count guards.
    *
    * Complete output mode makes the terminal result value-identical to the
    * batch twin (q38): state holds every window, nothing is withheld as
    * "not yet finalized" at end-of-stream, so the SAME DuckDB oracle
    * hash-checks this path. (Append mode would hold back the windows still
    * inside the watermark when the stream drains — rows-only at best.)
    *
    * Run-to-completion scaffolding (fresh checkpoint + memory sink + full
    * cleanup) lives in [[StreamingHarness]], shared with the stateful
    * sibling `StreamingSessionize.sessionsFileStream`.
    *
    * NOTE this function is EAGER: it runs the stream to completion at
    * call time (a terminal streaming result has no lazy form), so even a
    * schema-only caller pays one full execution.
    */
  def hourlyWindowFileStream(
      spark: SparkSession,
      eventsPath: String,
      tsCol: String = "ts",
      keys: Seq[String] = Seq("event_type"),
      valueCol: String = "value"
  ): DataFrame = {
    val raw = StreamingHarness.fileSource(spark, eventsPath)
    // Watermarks require an instant type; apply Tables.instantTs — the
    // SHARED vintage dispatch (TIMESTAMP(NANOS)-as-LongType needs
    // timestamp_micros(ts DIV 1000); a bare cast would read the long as
    // SECONDS since epoch and produce garbage windows). One helper, not a
    // copy: the two sites drifting is exactly how that bug shipped once.
    val stream = raw.withColumn(tsCol, graft.Tables.instantTs(raw.schema, tsCol))
    val rolled = hourlyWindow(stream, tsCol, keys, valueCol)
    StreamingHarness.runToMemorySink(spark, rolled, "complete", Nil, Seq(eventsPath))
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
