package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    * struct (type, coordinates) preserved as parsed. */
  def readFeatures(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("multiLine", "true")
      .json(path)
      .select(explode(col("features")).as("feature"))
      .select(col("feature.properties").as("properties"), col("feature.geometry").as("geometry"))

  /** The reference's grid-dimension load (reference src/etl.py:11-54):
    * reproject EPSG:4326→32632, surrogate `cell_id` = 0-based feature
    * index (reference `gdf.index`, src/etl.py:37 — reproduced faithfully
    * including its off-by-one vs the GeoJSON's 1-based `cellId` property,
    * SURVEY.md §1.4), bounds string, envelope WKT, created_at.
    */
  def gridCells(spark: SparkSession, path: String): DataFrame = {
    val feats = readFeatures(spark, path)
      .select(
        col("properties.cellId").cast("long").as("cell_id_prop"),
        col("geometry.coordinates").as("coords4326")
      )
      // deterministic 0-based index in feature order — geopandas' gdf.index
      .withColumn(
        "cell_id",
        (row_number().over(Window.orderBy(col("cell_id_prop"))) - 1).cast("int")
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
    * PROVINCIA→provincia, default population 0 (no population column in the
    * source file). Geometry kept as the parsed MultiPolygon coordinates
    * rendered to WKT-ish text via to_json (provinces arrive already in
    * EPSG:32632 — no reprojection, matching the reference's CRS guard). */
  def provinces(spark: SparkSession, path: String): DataFrame =
    readFeatures(spark, path)
      .select(
        coalesce(col("properties.PROVINCIA"), col("properties.name")).as("provincia"),
        to_json(col("geometry.coordinates")).as("geometry"),
        lit(0).cast("int").as("population")
      )
}
