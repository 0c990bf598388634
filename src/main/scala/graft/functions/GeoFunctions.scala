package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Geometry scalar functions for the reference's spatial surface
  * (SURVEY.md §2.10): CRS reprojection G1 (reference `src/etl.py:34-35`,
  * EPSG:4326 → EPSG:32632), envelope/bounds G2-G3 (`src/etl.py:26,39-42`),
  * and WKT rendering G4.
  *
  * Geometries are carried as GeoJSON-shaped coordinate arrays
  * (`array<array<array<double>>>` for Polygon rings) plus WKT strings —
  * no geometry object type, everything columnar and codegen-friendly.
  * Only the ellipsoidal reprojection is a UDF (transcendental math on two
  * doubles per row — negligible vs scan cost on a 10k-row dim).
  */
object GeoFunctions {

  // --- G2/G3: envelope & bounds over Polygon coordinate arrays -----------

  /** Bounds struct (minx,miny,maxx,maxy) of a Polygon coordinates array
    * (rings × points × [x,y]). Pure higher-order expressions. */
  def polygonBounds(coords: Column): Column = {
    val pts = flatten(coords)
    val xs = transform(pts, p => element_at(p, 1))
    val ys = transform(pts, p => element_at(p, 2))
    struct(
      array_min(xs).as("minx"),
      array_min(ys).as("miny"),
      array_max(xs).as("maxx"),
      array_max(ys).as("maxy")
    )
  }

  /** The reference's bounds string `"minx,miny,maxx,maxy"`
    * (src/etl.py:39-42). */
  def boundsString(bounds: Column): Column =
    concat_ws(",",
      bounds.getField("minx"), bounds.getField("miny"),
      bounds.getField("maxx"), bounds.getField("maxy"))

  /** WKT of the envelope — ST_AsText(ST_Envelope(g)) (src/etl.py:26). */
  def envelopeWkt(bounds: Column): Column = {
    val minx = bounds.getField("minx"); val miny = bounds.getField("miny")
    val maxx = bounds.getField("maxx"); val maxy = bounds.getField("maxy")
    format_string("POLYGON((%s %s, %s %s, %s %s, %s %s, %s %s))",
      minx, miny, maxx, miny, maxx, maxy, minx, maxy, minx, miny)
  }

  /** WKT POLYGON from a GeoJSON-shaped coordinates array (outer ring only
    * for envelope-equivalent use; full rings rendered comma-joined). */
  def polygonWkt(coords: Column): Column = {
    val rings = transform(
      coords,
      ring =>
        concat(
          lit("("),
          array_join(transform(ring, p => concat_ws(" ", element_at(p, 1), element_at(p, 2))), ", "),
          lit(")")
        )
    )
    concat(lit("POLYGON("), array_join(rings, ", "), lit(")"))
  }

  // --- G1: EPSG:4326 (WGS84 lon/lat) → EPSG:32632 (UTM zone 32N) ---------
  // Standard Transverse Mercator series (Snyder, "Map Projections — A
  // Working Manual", USGS PP 1395, eqs. 8-9..8-15). Public-domain math;
  // accuracy ~1 mm inside the zone.

  // Every constant below is exposed (package-visible) so the q173 DuckDB
  // oracle can embed the EXACT double values as literals (shortest-repr
  // decimal round-trips to identical bits) and replay the series with the
  // same IEEE operation tree — cross-engine agreement at integer-millimetre
  // presentation needs the arithmetic identical, not just the formula.
  private[graft] val A = 6378137.0 // WGS84 semi-major
  private val F = 1.0 / 298.257223563
  private[graft] val K0 = 0.9996
  private[graft] val E2 = F * (2 - F)
  private[graft] val EP2 = E2 / (1 - E2)
  private[graft] val Lon0 = math.toRadians(9.0) // UTM zone 32 central meridian
  private[graft] val FalseEasting = 500000.0
  // Meridian-arc series coefficients (Snyder eq. 3-21), precomputed once so
  // the oracle embeds the same binary values the projection multiplies by.
  private val E4 = E2 * E2
  private val E6 = E4 * E2
  private[graft] val M0 = 1 - E2 / 4 - 3 * E4 / 64 - 5 * E6 / 256
  private[graft] val M2 = 3 * E2 / 8 + 3 * E4 / 32 + 45 * E6 / 1024
  private[graft] val M4 = 15 * E4 / 256 + 45 * E6 / 1024
  private[graft] val M6 = 35 * E6 / 3072

  /** Forward projection of one WGS84 (lon, lat) degree pair to UTM 32N
    * (easting, northing) metres.
    *
    * Powers of a0 are explicit products (a2·a0, a2·a2, …), not
    * `math.pow`: one multiply each is faster, and — load-bearing for the
    * q173 oracle — a product tree is reproducible operation-for-operation
    * in any engine's double arithmetic, where `pow` implementations
    * differ by ulps between libms. */
  def wgs84ToUtm32n(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val lat = latDeg / 180.0 * math.Pi
    val lon = lonDeg / 180.0 * math.Pi
    val sinLat = math.sin(lat); val cosLat = math.cos(lat); val tanLat = math.tan(lat)
    val n = A / math.sqrt(1 - E2 * sinLat * sinLat)
    val t = tanLat * tanLat
    val c = EP2 * cosLat * cosLat
    val a0 = cosLat * (lon - Lon0)
    val a2 = a0 * a0; val a3 = a2 * a0; val a4 = a2 * a2
    val a5 = a4 * a0; val a6 = a4 * a2
    val m = A * (M0 * lat - M2 * math.sin(2 * lat) +
      M4 * math.sin(4 * lat) - M6 * math.sin(6 * lat))
    val x = K0 * n * (a0 + (1 - t + c) * a3 / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * EP2) * a5 / 120) + FalseEasting
    val y = K0 * (m + n * tanLat * (a2 / 2 +
      (5 - t + 9 * c + 4 * c * c) * a4 / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * EP2) * a6 / 720))
    (x, y)
  }

  /** UDF: reproject a GeoJSON Polygon coordinates array in place. */
  val reprojectPolygonUdf: UserDefinedFunction =
    udf { coords: Seq[Seq[Seq[Double]]] =>
      coords.map(_.map { p =>
        val (x, y) = wgs84ToUtm32n(p(0), p(1))
        Seq(x, y)
      })
    }

  /** UDF: reproject a single point, returned as (easting, northing). */
  val reprojectPointUdf: UserDefinedFunction =
    udf { (lon: Double, lat: Double) => wgs84ToUtm32n(lon, lat) }
}
