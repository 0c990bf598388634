package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/** GeoJSON FeatureCollection source (SURVEY.md §2.1 S4/S5): multiLine JSON
  * scan → explode(features) → per-feature properties + geometry columns.
  * Covers the reference's geopandas `read_file` of the Milano grid
  * (reference `src/etl.py:32`, 10k Polygon features, EPSG:4326) and the
  * Italian provinces (`src/etl.py:69`, 110 MultiPolygon features,
  * EPSG:32632).
  *
  * Scale note: `multiLine=true` makes one JSON document one task — fine for
  * dimension-sized inputs (the only GeoJSON in the reference); huge feature
  * collections should be pre-split to JSONL, which this reader also accepts
  * per-line.
  */
object GeoJsonSource {

  /** Raw features: one row per feature, `properties` struct + `geometry`
    * struct (type, coordinates) preserved as parsed, plus `feature_idx` —
    * the 0-based position within the FeatureCollection's `features` array
    * (geopandas' `gdf.index`). */
  def readFeatures(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("multiLine", "true")
      .json(path)
      .select(posexplode(col("features")).as(Seq("feature_idx", "feature")))
      .select(
        col("feature_idx").cast("int").as("feature_idx"),
        col("feature.properties").as("properties"),
        col("feature.geometry").as("geometry"))

  /** The reference's grid-dimension load (reference src/etl.py:11-54):
    * reproject EPSG:4326→32632, surrogate `cell_id` = 0-based feature
    * index (reference `gdf.index`, src/etl.py:37 — reproduced faithfully
    * including its off-by-one vs the GeoJSON's 1-based `cellId` property,
    * SURVEY.md §1.4), bounds string, envelope WKT, created_at.
    */
  def gridCells(spark: SparkSession, path: String): DataFrame = {
    val feats = readFeatures(spark, path)
      .select(
        // 0-based index in FEATURE ORDER — geopandas' gdf.index verbatim,
        // independent of the cellId property's values or ordering.
        col("feature_idx").as("cell_id"),
        col("geometry.coordinates").as("coords4326")
      )
    val projected = feats.withColumn("coords", GeoFunctions.reprojectPolygonUdf(col("coords4326")))
    val withBounds = projected.withColumn("b", GeoFunctions.polygonBounds(col("coords")))
    withBounds.select(
      col("cell_id"),
      GeoFunctions.polygonWkt(col("coords")).as("geometry"),
      GeoFunctions.boundsString(col("b")).as("bounds"),
      GeoFunctions.envelopeWkt(col("b")).as("envelope_wkt"),
      current_timestamp().as("created_at")
    )
  }

  /** The provinces-dimension load (reference src/etl.py:57-95): rename
    * PROVINCIA→provincia (falling back to a `name` property), population
    * coerced-or-0 (reference src/etl.py:79-82 `to_numeric(errors='coerce')
    * .fillna(0).astype(int)` when the column exists, literal 0 otherwise).
    * Geometry kept as the parsed MultiPolygon coordinates rendered to
    * WKT-ish text via to_json (provinces arrive already in EPSG:32632 — no
    * reprojection, matching the reference's CRS guard).
    *
    * Property access is SCHEMA-CONDITIONAL: JSON inference only creates
    * fields present in the file, so referencing a missing
    * `properties.name`/`population` unconditionally would throw — this
    * mirrors the reference's "check column presence before renaming". */
  def provinces(spark: SparkSession, path: String): DataFrame = {
    val feats = readFeatures(spark, path)
    val propFields: Set[String] = feats.schema("properties").dataType match {
      case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSet
      case _ => Set.empty
    }
    def prop(name: String): Option[Column] =
      if (propFields.contains(name)) Some(col(s"properties.$name")) else None
    val nameCols = Seq("PROVINCIA", "name").flatMap(prop)
    require(nameCols.nonEmpty, s"provinces GeoJSON at $path has neither PROVINCIA nor name property")
    val population = prop("population")
      .map(p => coalesce(p.cast("double"), lit(0.0)).cast("int"))
      .getOrElse(lit(0).cast("int"))
    feats.select(
      coalesce(nameCols: _*).as("provincia"),
      to_json(col("geometry.coordinates")).as("geometry"),
      population.as("population")
    )
  }
}
