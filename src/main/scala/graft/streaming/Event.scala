package graft.streaming

import java.sql.Timestamp

/** The events-table row shape shared by the stateful streaming operators
  * ([[StreamingTransitions]], [[StreamingThrottle]], [[StreamingFunnel]]):
  * one definition, so a schema change or a fix to the microsecond
  * arithmetic lands once. */
final case class Event(user_id: Long, event_id: Long, event_type: String, ts: Timestamp)

object Event {

  /** Event-time in microseconds — `getTime` is millisecond-truncated, so
    * the sub-millisecond remainder comes from `getNanos`. */
  def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000
}
