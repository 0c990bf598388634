package graft

import org.apache.spark.sql.functions._
import graft.operators.Spatial

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  // Two adjacent unit tiles and one tile with a hole.
  private val square: Seq[Seq[Seq[Double]]] =
    Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(1.0, 1.0), Seq(0.0, 1.0), Seq(0.0, 0.0)))
  private val squareEast: Seq[Seq[Seq[Double]]] =
    Seq(Seq(Seq(1.0, 0.0), Seq(2.0, 0.0), Seq(2.0, 1.0), Seq(1.0, 1.0), Seq(1.0, 0.0)))
  private val donut: Seq[Seq[Seq[Double]]] = Seq(
    Seq(Seq(10.0, 10.0), Seq(14.0, 10.0), Seq(14.0, 14.0), Seq(10.0, 14.0), Seq(10.0, 10.0)),
    Seq(Seq(11.0, 11.0), Seq(13.0, 11.0), Seq(13.0, 13.0), Seq(11.0, 13.0), Seq(11.0, 11.0))
  )

  private def polys = Seq(
    ("west", square), ("east", squareEast), ("donut", donut)
  ).toDF("poly_id", "coords")

  private def points = Seq(
    (1L, 0.5, 0.5),   // inside west
    (2L, 1.5, 0.5),   // inside east
    (3L, 12.0, 12.0), // inside donut's hole → no match
    (4L, 10.5, 12.0), // inside donut ring
    (5L, 5.0, 5.0)    // outside everything
  ).toDF("pt_id", "x", "y")

  test("pointInRings: even-odd rule with holes") {
    assert(Spatial.pointInRings(0.5, 0.5, square))
    assert(!Spatial.pointInRings(1.5, 1.5, square))
    assert(!Spatial.pointInRings(12.0, 12.0, donut), "hole subtracts")
    assert(Spatial.pointInRings(10.5, 12.0, donut))
  }

  test("shared tile border lands in exactly one tile") {
    val w = Spatial.pointInRings(1.0, 0.5, square)
    val e = Spatial.pointInRings(1.0, 0.5, squareEast)
    assert(w ^ e, s"border point in west=$w east=$e — must be exactly one")
  }

  test("containsJoin (broadcast) assigns points to containing polygons") {
    val got = Spatial.containsJoin(points, polys, "x", "y", "coords")
      .select("pt_id", "poly_id").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "west"), (2L, "east"), (4L, "donut")))
  }

  test("bucketedContainsJoin agrees with the broadcast tier") {
    val broadcastRes = Spatial.containsJoin(points, polys, "x", "y", "coords")
      .select("pt_id", "poly_id").as[(Long, String)].collect().toSet
    for (cell <- Seq(0.5, 1.0, 3.0)) {
      val bucketed = Spatial.bucketedContainsJoin(points, polys, "x", "y", "coords", cell)
        .select("pt_id", "poly_id").as[(Long, String)].collect().toSet
      assert(bucketed == broadcastRes, s"cellSize=$cell")
    }
  }

  test("bucketed join plans an equi-join shuffle, not a cross product") {
    val plan = Spatial.bucketedContainsJoin(points, polys, "x", "y", "coords", 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
