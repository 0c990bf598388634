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

  /** Keyed snapshot diff — the audit twin of [[upsertLatest]]: what changed
    * between two versions of a table. One row per key present in either
    * snapshot, tagged `added` (revised only), `removed` (base only),
    * `changed` (both sides, some `compareCols` differ), or `unchanged`.
    * Comparisons are null-safe (`<=>`): a null→value transition is a
    * change, null→null is not. `keys` must be unique within each snapshot
    * (it is a KEYED snapshot — run [[upsertLatest]] or an aggregate first
    * if not); duplicate keys would multiply through the outer join.
    *
    * Scale shape: one hash shuffle per side on `keys` feeding the full
    * outer join, status computed row-locally after it — no collect, no
    * row-fingerprint hashing (column-wise null-safe equality is exact and
    * engine-portable where a serialized-row hash is not). Pair with a
    * status-keyed aggregate for the dashboard row counts; keep the row
    * stream for writing an audit table.
    */
  def snapshotDiff(
      base: DataFrame,
      revised: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    require(keys.intersect(compareCols).isEmpty,
      s"keys and compareCols must be disjoint; both contain ${keys.intersect(compareCols).mkString(",")}")
    val reserved = (keys ++ compareCols).filter(c =>
      c == "__b" || c == "__r" || c.startsWith("__r_") || c == "status")
    require(reserved.isEmpty,
      s"column names collide with snapshotDiff internals: ${reserved.mkString(",")}")
    val b = base.select((keys ++ compareCols).map(col): _*)
      .withColumn("__b", lit(1))
    val r = revised.select((keys ++ compareCols).map(col): _*)
      .withColumnsRenamed(compareCols.map(c => c -> s"__r_$c").toMap)
      .withColumn("__r", lit(1))
    val same = compareCols
      .map(c => col(c) <=> col(s"__r_$c"))
      .reduce(_ && _)
    b.join(r, keys, "full_outer")
      .withColumn("status",
        when(col("__b").isNull, "added")
          .when(col("__r").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed"))
      .select(keys.map(col) :+ col("status"): _*)
  }
}
