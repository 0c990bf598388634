package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Deterministic geometry synthesis from harness table ids — the fixture
  * generator that makes the spatial operators (SURVEY.md §2.6 J5, §2.10
  * G2-G4) DRIVER-GATE visible: the reference's spatial surface lives in
  * PostGIS (GiST containment, reference `src/database.py:114`; envelope/
  * bounds SQL, `src/etl.py:26,39-42`), whose geometries the harness tables
  * don't carry — so the catalog queries synthesize them, reproducibly, from
  * ids both engines share. Every coordinate is pure integer/bit arithmetic
  * on `mix64(id)` followed by one exact binary scale, so a DuckDB oracle
  * rebuilds bit-identical doubles and value-checks the even-odd containment
  * decisions and envelope math (the q168 codec-oracle move, applied to
  * geometry).
  *
  * Shapes are DIAMONDS (45°-rotated squares), some with a concentric
  * diamond HOLE: every edge is slanted, so containment exercises the
  * general even-odd crossing test (axis-aligned rectangles would reduce it
  * to the bounds pre-filter), and hole rings prove the multi-ring parity
  * path. All vertex coordinates are integer-valued doubles — exact in
  * binary, and rendering-stable across engines for the bounds/WKT strings.
  */
object SyntheticGeo {

  private def pt(x: Column, y: Column): Column =
    array(x.cast("double"), y.cast("double"))

  /** One tile polygon per input row: a diamond centred on a 5×5 grid cell
    * (centres 10..90 step 20 on both axes), radius `6 + (mix64(key) & 3)`,
    * with a half-radius concentric hole when `mix64(key) & 4` is set.
    * Output: `(tile_id, coords)` with GeoJSON-shaped
    * `array<array<array<double>>>` coords (ring 0 outer, ring 1 hole). */
  def tilePolygons(df: DataFrame, keyCol: String): DataFrame = {
    val staged = df
      .select(col(keyCol).cast("long").as("__t"))
      .withColumn("__mh", HashFunctions.mix64(col("__t")))
      .withColumn("__r", col("__mh").bitwiseAND(lit(3L)) + lit(6L))
    val cx = (expr("__t % 5") * 20 + 10).cast("double")
    val cy = (expr("(__t div 5) % 5") * 20 + 10).cast("double")
    val r = col("__r").cast("double")
    val hr = expr("__r div 2").cast("double") // 6,7 → 3; 8,9 → 4
    def diamond(rad: Column) = array(
      pt(cx - rad, cy), pt(cx, cy - rad), pt(cx + rad, cy), pt(cx, cy + rad))
    staged.select(
      col("__t").as("tile_id"),
      when(col("__mh").bitwiseAND(lit(4L)) =!= 0L,
        array(diamond(r), diamond(hr)))
        .otherwise(array(diamond(r)))
        .as("coords"))
  }

  /** One point per input row, hash-placed in [0, 100)²: two disjoint
    * 14-bit windows of `mix64(id)` scaled by the exact binary factor
    * 100/16384. Output: `(point_id, x, y)`. */
  def hashPoints(df: DataFrame, idCol: String): DataFrame = {
    val mh = HashFunctions.mix64(col(idCol).cast("long"))
    df.select(
      col(idCol).cast("long").as("point_id"),
      (mh.bitwiseAND(lit(16383L)).cast("double") * 100.0 / 16384.0).as("x"),
      (shiftrightunsigned(mh, 20).bitwiseAND(lit(16383L)).cast("double") * 100.0 / 16384.0).as("y"))
  }
}
