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

  test("scd2Apply: closes changed, keeps unchanged/absent, inserts new keys") {
    import java.sql.Timestamp
    def ts(x: String) = Timestamp.valueOf(x)
    val hist = Seq(
      // closed historical version must pass through untouched
      (1L, 10L, ts("2023-12-01 00:00:00"), Option(ts("2024-01-01 00:00:00"))),
      (1L, 11L, ts("2024-01-01 00:00:00"), Option.empty[Timestamp]), // will change
      (2L, 20L, ts("2024-01-01 00:00:00"), Option.empty[Timestamp]), // unchanged
      (3L, 30L, ts("2024-01-01 00:00:00"), Option.empty[Timestamp])  // absent from batch
    ).toDF("k", "v", "valid_from", "valid_to")
    val batch = Seq(
      (1L, 12L, ts("2024-02-01 00:00:00")),
      (2L, 20L, ts("2024-02-01 00:00:00")),
      (4L, 40L, ts("2024-02-01 00:00:00")) // new key
    ).toDF("k", "v", "ts")
    val out = Merge.scd2Apply(hist, batch, Seq("k"), Seq("v"), "ts")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getTimestamp(2).toString, Option(r.getTimestamp(3)).map(_.toString))).toSet
    assert(got == Set(
      (1L, 10L, "2023-12-01 00:00:00.0", Some("2024-01-01 00:00:00.0")),
      (1L, 11L, "2024-01-01 00:00:00.0", Some("2024-02-01 00:00:00.0")), // closed
      (1L, 12L, "2024-02-01 00:00:00.0", None),                          // new open
      (2L, 20L, "2024-01-01 00:00:00.0", None),                          // untouched
      (3L, 30L, "2024-01-01 00:00:00.0", None),                          // untouched
      (4L, 40L, "2024-02-01 00:00:00.0", None)))                         // inserted
    // one open row per key is preserved as an invariant
    val opens = out.filter("valid_to IS NULL").groupBy("k").count()
      .select("count").as[Long].collect()
    assert(opens.forall(_ == 1L))
    // idempotency: re-applying the identical batch changes nothing
    val again = Merge.scd2Apply(out, batch, Seq("k"), Seq("v"), "ts")
    val got2 = again.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getTimestamp(2).toString, Option(r.getTimestamp(3)).map(_.toString))).toSet
    assert(got2 == got)
  }

  test("scd2Apply null-safe compare: null -> value is a change, null -> null is not") {
    import java.sql.Timestamp
    def ts(x: String) = Timestamp.valueOf(x)
    val hist = Seq(
      (1L, Option.empty[Long], ts("2024-01-01 00:00:00"), Option.empty[Timestamp]),
      (2L, Option.empty[Long], ts("2024-01-01 00:00:00"), Option.empty[Timestamp])
    ).toDF("k", "v", "valid_from", "valid_to")
    val batch = Seq(
      (1L, Option(5L), ts("2024-02-01 00:00:00")),
      (2L, Option.empty[Long], ts("2024-02-01 00:00:00"))
    ).toDF("k", "v", "ts")
    val out = Merge.scd2Apply(hist, batch, Seq("k"), Seq("v"), "ts")
    assert(out.count() == 3L) // k=1 closed+opened, k=2 untouched
    assert(out.filter("k = 2 AND valid_to IS NULL").count() == 1L)
  }

  test("mergeSummaries(summarize(A), summarize(B)) equals summarize(A union B) exactly") {
    val rng = new scala.util.Random(5)
    val rows = (1 to 300).map(i => (s"k${rng.nextInt(6)}", rng.nextDouble() * 1000 - 200))
    // arbitrary split, including a key that only appears on one side
    val (a, b) = rows.splitAt(137)
    val aDf = (a :+ (("onlyA", 42.5))).toDF("k", "v")
    val bDf = (b :+ (("onlyB", -7.25))).toDF("k", "v")
    val merged = Merge.mergeSummaries(
        Merge.summarize(aDf, Seq("k"), "v"),
        Merge.summarize(bDf, Seq("k"), "v"), Seq("k"))
      .orderBy("k").collect().toSeq
    val direct = Merge.summarize(aDf.unionByName(bDf), Seq("k"), "v")
      .orderBy("k").collect().toSeq
    assert(merged == direct) // bit-exact, decimal sums included
  }

  test("summarize sum stays decimal until presentation (merge order cannot drift)") {
    val df = Seq(("k", 0.1), ("k", 0.2), ("k", 0.3)).toDF("k", "v")
    val t = Merge.summarize(df, Seq("k"), "v").schema("sum_v").dataType
    assert(t == org.apache.spark.sql.types.DecimalType(38, 4), t.toString)
  }
}
