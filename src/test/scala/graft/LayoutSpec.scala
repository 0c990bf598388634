package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference Morton interleave. */
  private def mortonRef(x: Long, y: Long): Long = {
    def spread(v: Long): Long = {
      var a = v & 0xFFFFL
      a = (a | (a << 8)) & 0x00FF00FFL
      a = (a | (a << 4)) & 0x0F0F0F0FL
      a = (a | (a << 2)) & 0x33333333L
      (a | (a << 1)) & 0x55555555L
    }
    spread(x) | (spread(y) << 1)
  }

  test("zOrder2 matches the reference interleave on random and edge coordinates") {
    val rnd = new scala.util.Random(7)
    val pts = (Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L), (1L, 2L)) ++
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))).distinct
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zOrder2($"x", $"y").as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y), s"($x,$y)")
    }
  }

  test("zOrder2 is a bijection on the grid (no key collisions)") {
    val n = 256
    val df = spark.range(n * n)
      .select(($"id" % n).as("x"), ($"id" / n).cast("long").as("y"))
    assert(df.select(Layout.zOrder2($"x", $"y")).distinct().count() == n.toLong * n)
  }

  test("quantize maps the range onto [0, 2^16) and clamps outliers") {
    val df = Seq(-1.0, 0.0, 0.5, 1.0, 2.0).toDF("v")
      .select($"v", Layout.quantize($"v", 0.0, 1.0).as("q"))
    val got = df.collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got(-1.0) == 0L && got(0.0) == 0L && got(2.0) == 65535L && got(1.0) == 65535L)
    assert(got(0.5) == 32768L || got(0.5) == 32767L)
  }

  test("z-clustered partitions have far tighter 2D footprints than the incoming layout") {
    // uniform 2D points, arriving in random order (hash-partitioned by id)
    val pts = spark.range(20000)
      .select(
        $"id",
        (HashRefCol.mix64($"id") % 1024 + 1024) % 1024,
        (HashRefCol.mix64($"id" + 7) % 1024 + 1024) % 1024)
      .toDF("id", "x", "y")
      .repartition(16)
    def avgBboxArea(df: org.apache.spark.sql.DataFrame): Double =
      df.groupBy(spark_partition_id())
        .agg(((max($"x") - min($"x")) * (max($"y") - min($"y"))).as("a"))
        .agg(avg($"a")).head.getDouble(0)
    val before = avgBboxArea(pts)
    val after = avgBboxArea(Layout.clusterByZ(pts, $"x", $"y", 16))
    // random layout: every partition spans ~the whole 1024×1024 square;
    // 16 z-ranges tile it, so each partition covers ~1/16 of the area
    assert(after < before * 0.25, s"after=$after before=$before")
  }

  test("bbox predicates on z-clustered parquet keep pushed-down scan filters") {
    val dir = java.nio.file.Files.createTempDirectory("zlay").toString
    val pts = spark.range(5000)
      .select($"id", ($"id" % 71).as("x"), ($"id" % 97).as("y"))
    Layout.clusterByZ(pts, $"x", $"y", 8).write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir).filter($"x" between (10, 20)).filter($"y" between (30, 40))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(x,10)") || plan.contains("GreaterThanOrEqual(x,10L)")),
      s"bbox filter must reach the parquet scan:\n$plan")
    // and the data survives the re-layout intact
    assert(spark.read.parquet(dir).count() == 5000)
  }

  test("pruningAudit counts prunable tiles and rows per probe box") {
    val tiles = Seq(
      // tile footprints: (n_rows, x_min, x_max, y_min, y_max)
      (10L, 0L, 9L, 0L, 9L),
      (20L, 10L, 19L, 0L, 9L),
      (30L, 0L, 9L, 10L, 19L)
    ).toDF("n_rows", "x_min", "x_max", "y_min", "y_max")
    val boxes = Seq(
      (1L, 0L, 5L, 0L, 5L), // overlaps tile 1 only
      (2L, 0L, 25L, 0L, 25L), // overlaps everything
      (3L, 50L, 60L, 50L, 60L), // disjoint from all tiles
      (4L, 10L, 10L, 9L, 9L) // inclusive-boundary touch: tile 2 only
    ).toDF("box_id", "x_lo", "x_hi", "y_lo", "y_hi")
    val out = graft.operators.Layout.pruningAudit(tiles, boxes)
      .orderBy("box_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 2L, 60L, 10L),
      (2L, 3L, 0L, 60L, 60L),
      (3L, 3L, 3L, 60L, 0L),
      (4L, 3L, 2L, 60L, 20L)))
  }

  test("compactionPlan: greedy first-fit groups, oversized file isolation, per-partition plans") {
    // target 100: [60, 30, 50, 250, 10, 90] in order →
    // cum-before  [ 0, 60, 90, 140, 390, 400]
    // group       [ 0,  0,  0,   1,   3,   4]
    // 250 lands in group 1 (bytes before it: 140) and pushes the next file
    // to group 3 — an oversized file never splits, it absorbs its span.
    val files = Seq(
      ("p", 1L, 60L), ("p", 2L, 30L), ("p", 3L, 50L),
      ("p", 4L, 250L), ("p", 5L, 10L), ("p", 6L, 90L),
      ("q", 1L, 10L), ("q", 2L, 10L) // separate partition: its own plan
    ).toDF("part", "seq", "bytes")
    val out = Layout.compactionPlan(files, "bytes", Seq("seq"),
        targetBytes = 100L, partitionCols = Seq("part"))
      .select("part", "seq", "compaction_group", "group_seq")
      .as[(String, Long, Long, Int)].collect().toSeq.sorted
    assert(out == Seq(
      ("p", 1L, 0L, 1), ("p", 2L, 0L, 2), ("p", 3L, 0L, 3),
      ("p", 4L, 1L, 1), ("p", 5L, 3L, 1), ("p", 6L, 4L, 1),
      ("q", 1L, 0L, 1), ("q", 2L, 0L, 2)))
  }

  test("compactionPlan validates inputs") {
    val f = Seq(("a", 1L)).toDF("k", "bytes")
    intercept[IllegalArgumentException] {
      Layout.compactionPlan(f, "bytes", Seq("k"), targetBytes = 0L)
    }
    intercept[IllegalArgumentException] {
      Layout.compactionPlan(f, "bytes", Nil, targetBytes = 10L)
    }
  }
}

/** Column-side mix64 for test fixtures (matches [[HashRef.mix64]]). */
object HashRefCol {
  def mix64(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.HashFunctions.mix64(c.cast("long"))
}
