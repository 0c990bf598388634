package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key ingestion throttle — "admit at most N events per user", the
  * quota/rate-cap primitive an ingestion edge applies before letting a
  * feed into the pipeline (the streaming face of `Sampling.capPerGroup`'s
  * bounded selection).
  *
  * Scale shape: state is ONE long per key (admitted-so-far), shuffled
  * once on the key into the state store; emitted rows are the admitted
  * prefix only. Within a micro-batch events fold in (ts, event_id) order
  * — a total order, so with event-time-ordered delivery the admitted set
  * equals the batch twin `throttleBatch` exactly (StreamingSpec pins
  * this); late events consume quota in arrival order, the standard
  * streaming approximation. State never times out: one counter per
  * ever-seen key — bound with a state-store TTL when the key universe is
  * unbounded.
  */
object StreamingThrottle {

  /** Admit the first `limit` events per key from a STREAMING
    * Dataset[Event]; drop the rest. */
  def throttled(events: Dataset[Event], limit: Int): Dataset[Event] = {
    require(limit > 0, "throttle limit must be positive")
    implicit val stateEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[Event]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, batch: Iterator[Event], state: GroupState[Long]) => {
          val sorted = batch.toSeq.sortBy(e => (Event.micros(e.ts), e.event_id))
          var n = state.getOption.getOrElse(0L)
          val out = sorted.take(math.max(0L, limit.toLong - n).toInt)
          n += sorted.size // count ALL seen, so quota can't re-open
          state.update(n)
          out.iterator
        })
  }

  /** Batch twin: the first `limit` rows per key in (ts, event_id) order —
    * exactly what [[throttled]] admits under event-time-ordered delivery.
    * A row_number window per key; at scale this is the one genuinely
    * ordered per-key pass, same budget as `Sampling.budgetPerGroup`. */
  def throttleBatch(events: DataFrame, limit: Int): DataFrame = {
    require(limit > 0, "throttle limit must be positive")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= limit)
      .drop("__rn")
  }
}
