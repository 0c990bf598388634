package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Merge

/** Streaming CDC sink: maintain a latest-wins parquet SNAPSHOT from a
  * change stream — the streaming closure of the batch upsert (q78's
  * [[Merge.upsertLatest]]), and the engine's answer to the reference's
  * in-place row updates arriving continuously.
  *
  * Shape: `foreachBatch` turns each micro-batch into a batch frame, merges
  * it into the current snapshot with the SAME operator the batch path
  * uses, writes the merged snapshot to a temp dir, and swaps it in with
  * the two-rename discipline of
  * [[graft.pipeline.MilanPipeline.backfillColumn]] (crash before the first
  * rename: table untouched; crash between renames: `.upsert_old` survives
  * and [[recoverSnapshot]] restores it).
  *
  * Exactly-once without a transactional table format: the checkpoint
  * makes micro-batch delivery at-least-once into `foreachBatch`, and
  * `upsertLatest`'s total order makes re-applying the same change batch a
  * NO-OP — idempotent apply on top of at-least-once delivery. Snapshot
  * cost is a full rewrite per micro-batch, the honest parquet-native
  * trade: at 100 TB you partition the snapshot (e.g. by key range or
  * day) and rewrite only the partitions a batch touches — the same
  * dynamic-overwrite shape the K1 loader uses.
  */
object StreamingSink {

  /** Start the snapshot-maintaining query (caller awaits/stops it).
    *
    * @param changes    streaming change frame (same schema the snapshot
    *                   will have)
    * @param versionCol newest-wins ordering column. For an UPDATE-mode
    *                   upstream (e.g. [[StreamingLeaders]]) a CONSTANT
    *                   version column is the right choice:
    *                   `upsertLatest` breaks version ties updates-first,
    *                   so the newest emission for a key always wins.
    * @param tieBreak   unique-per-(key, version) column for deterministic
    *                   survivors (see [[Merge.upsertLatest]])
    * @param outputMode "append" for plain change streams; "update" when
    *                   the upstream is a stateful aggregation re-emitting
    *                   revised rows per trigger (Append on an
    *                   unwatermarked aggregation fails analysis)
    */
  def upsertSnapshot(
      changes: DataFrame,
      snapshotDir: String,
      checkpointDir: String,
      keys: Seq[String],
      versionCol: String,
      tieBreak: String,
      outputMode: String = "append"): StreamingQuery =
    changes.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        applyBatch(batch, snapshotDir, keys, versionCol, tieBreak)
      }
      .start()

  /** One micro-batch application — also the unit the spec drives directly
    * (deterministic, no stream timing). */
  private[graft] def applyBatch(
      batch: Dataset[Row],
      snapshotDir: String,
      keys: Seq[String],
      versionCol: String,
      tieBreak: String): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val target = new Path(snapshotDir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(snapshotDir + ".upsert_tmp")
    val old = new Path(snapshotDir + ".upsert_old")
    require(!fs.exists(old), s"unfinished upsert swap at $old — run recoverSnapshot first")
    val exists = fs.exists(target)
    val base = if (exists) spark.read.parquet(snapshotDir) else batch.limit(0).toDF()
    val merged = Merge.upsertLatest(base, batch.toDF(), keys, versionCol, tieBreak)
    // the tmp write MATERIALIZES the merge (it still reads the old
    // snapshot lazily) before any rename disturbs the inputs
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (exists) {
      if (!fs.rename(target, old)) sys.error(s"upsert swap failed: $target -> $old")
      if (!fs.rename(tmp, target)) sys.error(s"upsert swap failed: $tmp -> $target")
      fs.delete(old, true)
    } else if (!fs.rename(tmp, target)) sys.error(s"upsert swap failed: $tmp -> $target")
  }

  /** Restore after a crash mid-swap. Two distinguishable crash states:
    * snapshot dir missing + `.upsert_old` present → the swap DIDN'T finish,
    * move the old snapshot back; both present → the swap DID finish and
    * only the cleanup delete was lost, so drop the superseded `.upsert_old`
    * (without this branch the leftover would deadlock every later
    * `applyBatch` against a perfectly healthy snapshot). Returns true if
    * anything was repaired. */
  def recoverSnapshot(spark: SparkSession, snapshotDir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val target = new Path(snapshotDir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(snapshotDir + ".upsert_old")
    if (!fs.exists(old)) false
    else if (!fs.exists(target)) {
      // a failed repair must be LOUD: returning false here would be
      // indistinguishable from "nothing to repair" while the data sits
      // only in .upsert_old and every applyBatch keeps refusing
      if (!fs.rename(old, target)) sys.error(s"recover failed: $old -> $target")
      true
    } else {
      if (!fs.delete(old, true)) sys.error(s"recover failed: delete $old")
      true
    }
  }
}
