package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming join surface (SURVEY.md §2.12): the two join shapes a live
  * pipeline needs, each in its state-bounded form.
  *
  *  - Stream-static enrichment: the streaming side keeps flowing, the
  *    dimension is broadcast per micro-batch — no streaming state at all,
  *    and dimension updates are picked up on the next batch (each
  *    micro-batch re-resolves the static side).
  *  - Stream-stream interval join: both sides watermarked, the join
  *    condition carries an explicit event-time band, so the state store
  *    holds only the band + watermark horizon per key — without the band
  *    Spark would have to buffer BOTH streams forever.
  */
object StreamingJoin {

  /** Enrich a stream with a static dimension (broadcast hash join per
    * micro-batch). `dim` must be the small side — this is the streaming
    * twin of the batch dimension joins (J2/J3). */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      key: String,
      dimCols: Seq[String]): DataFrame =
    stream.join(
      broadcast(dim.select((key +: dimCols).map(col): _*)),
      Seq(key),
      "left")

  /** Watermarked stream-stream join: left rows match right rows with the
    * same `key` and a right event time within `[leftTs, leftTs + band]` —
    * the "purchase follows click within the attribution window" shape.
    *
    * Both watermarks plus the banded time condition bound the state store:
    * each side is dropped from state once the other side's watermark
    * passes its band edge. `band` and `watermark` are SQL interval strings
    * (e.g. "1 hour").
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      band: String,
      watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    val cond: Column =
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $band")
    l.join(r, cond)
  }
}
