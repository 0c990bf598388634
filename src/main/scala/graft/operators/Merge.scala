package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot upsert (CDC "latest wins") — the distributed generalization of
  * the reference's read-modify-write backfill (reference `src/etl.py:21-29`:
  * UPDATE rows in place where a newer value exists).
  *
  * A 100 TB table can't be updated in place: the scalable shape is
  * base-snapshot ∪ change-batch → one window pass keeping the newest row per
  * key → new snapshot. The union does NOT shuffle by itself; the single
  * shuffle is the window's hash partition on the key columns — the same
  * exchange a downstream join/groupBy on those keys then reuses. Compare
  * MERGE INTO of the lakehouse table formats: same semantics, expressed as a
  * pure-DataFrame operator.
  */
object Merge {

  /** Latest-wins upsert of `updates` into `base`.
    *
    * Keeps, per `keys`, the row with the greatest (`versionCol`,
    * updates-over-base, `tieBreak`) — the explicit total order makes the
    * survivor deterministic under re-partitioning and re-runs even when the
    * same key carries equal versions in both inputs (an idempotent re-apply
    * of the same change batch is a no-op). Both inputs must share a schema;
    * `tieBreak` must be unique per (key, version, side) for full determinism
    * (an event/change id in practice).
    */
  def upsertLatest(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      versionCol: String,
      tieBreak: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"schema mismatch: base ${base.columns.mkString(",")} vs updates ${updates.columns.mkString(",")}")
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("__src").desc, col(tieBreak).desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }
}
