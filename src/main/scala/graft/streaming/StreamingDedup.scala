package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming exact deduplication — the continuous-ingest twin of the batch
  * `Dedup.exactGroups` tier (catalog q20): drop any document whose
  * normalized content fingerprint was already seen.
  *
  * `dropDuplicatesWithinWatermark` keys engine-managed state on the
  * 128-bit fingerprint and EVICTS entries older than the watermark — the
  * property that matters at scale: unbounded `dropDuplicates` state grows
  * with every distinct document forever, while watermarked state is bounded
  * by (ingest rate × horizon). The horizon is the dedup guarantee window:
  * an exact re-post later than `horizon` after the original is treated as
  * new — the standard trade for a pipeline that must run indefinitely.
  */
object StreamingDedup {

  /** @param horizon watermark delay; duplicates arriving within this
    *                event-time window of the first copy are dropped. */
  def dedupStream(
      df: DataFrame,
      tsCol: String,
      textCol: String,
      horizon: String = "1 hour"): DataFrame =
    df.withColumn("fp", TextFunctions.fingerprintMd5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Batch twin of [[dedupStream]] — the IDENTICAL fingerprint key, with
    * Spark's plain `Deduplicate` standing in for the watermark-evicted
    * state store (`dropDuplicatesWithinWatermark` analyzes streaming-only;
    * a finite batch needs no horizon). Catalog q92 runs this form, putting
    * driver-level regression cover on the shared key derivation; the
    * state-store path itself is exercised by StreamingSpec. */
  def dedupBatch(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp", TextFunctions.fingerprintMd5(col(textCol)))
      .dropDuplicates("fp")
}
