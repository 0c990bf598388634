package graft

import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff tags added/removed/changed/unchanged, null-safe") {
    val base = Seq(
      (1L, Some(10.0), "a"), // unchanged
      (2L, Some(20.0), "b"), // changed (value)
      (3L, None: Option[Double], "c"), // changed (null → value)
      (4L, Some(40.0), "d") // removed
    ).toDF("id", "v", "s")
    val revised = Seq(
      (1L, Some(10.0), "a"),
      (2L, Some(21.0), "b"),
      (3L, Some(3.0), "c"),
      (5L, Some(50.0), "e") // added
    ).toDF("id", "v", "s")
    val out = Merge.snapshotDiff(base, revised, Seq("id"), Seq("v", "s"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("snapshotDiff rejects key/compare overlap and reserved names") {
    val df = Seq((1L, 1.0)).toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] {
      Merge.snapshotDiff(df, df, Seq("id"), Seq("id", "v"))
    }
    assert(e1.getMessage.contains("disjoint"))
    val bad = Seq((1L, 1.0)).toDF("id", "__b")
    val e2 = intercept[IllegalArgumentException] {
      Merge.snapshotDiff(bad, bad, Seq("id"), Seq("__b"))
    }
    assert(e2.getMessage.contains("collide"))
  }

  test("snapshotDiff of a snapshot against itself is all unchanged") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val st = Merge.snapshotDiff(df, df, Seq("id"), Seq("v"))
      .select("status").distinct().as[String].collect().toSeq
    assert(st == Seq("unchanged"))
  }
}
