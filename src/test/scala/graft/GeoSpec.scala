package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("WGS84→UTM32N: central meridian maps to false easting 500000") {
    val (x, _) = GeoFunctions.wgs84ToUtm32n(9.0, 45.0)
    assert(math.abs(x - 500000.0) < 1e-6)
  }

  test("WGS84→UTM32N matches published coordinates for Milan Duomo") {
    // Milan Duomo 45.4642°N 9.1900°E ≈ UTM 32N E 514851, N 5034550 (±50 m
    // tolerance for the published rounding)
    val (x, y) = GeoFunctions.wgs84ToUtm32n(9.19, 45.4642)
    assert(math.abs(x - 514851.0) < 50.0, s"easting $x")
    assert(math.abs(y - 5034550.0) < 200.0, s"northing $y")
  }

  test("polygonBounds and boundsString reproduce the reference format") {
    val coords: Seq[Seq[Seq[Double]]] =
      Seq(Seq(Seq(9.0, 45.0), Seq(9.01, 45.0), Seq(9.01, 45.01), Seq(9.0, 45.01), Seq(9.0, 45.0)))
    val df = Seq(Tuple1(coords)).toDF("coords")
      .select(GeoFunctions.polygonBounds($"coords").as("b"))
      .select(GeoFunctions.boundsString($"b").as("s"), $"b.minx", $"b.maxy")
    val r = df.collect()(0)
    assert(r.getAs[String]("s") == "9.0,45.0,9.01,45.01")
  }

  test("envelopeWkt renders a closed 5-point polygon") {
    val coords: Seq[Seq[Seq[Double]]] = Seq(Seq(Seq(0.0, 0.0), Seq(2.0, 0.0), Seq(2.0, 1.0), Seq(0.0, 1.0), Seq(0.0, 0.0)))
    val wkt = Seq(Tuple1(coords)).toDF("coords")
      .select(GeoFunctions.envelopeWkt(GeoFunctions.polygonBounds($"coords"))).as[String].collect()(0)
    assert(wkt == "POLYGON((0.0 0.0, 2.0 0.0, 2.0 1.0, 0.0 1.0, 0.0 0.0))")
  }
}
