package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{StreamingLeaders, StreamingSink}

class StreamingSinkSpec extends SparkSpec {
  import spark.implicits._

  private def readSnap(dir: String) =
    spark.read.parquet(dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq

  test("applyBatch creates, upserts, and is idempotent on re-application") {
    val dir = Files.createTempDirectory("snap").toString + "/t"
    val b1 = Seq((1L, 10.0, 1L), (2L, 20.0, 2L)).toDF("k", "v", "ver")
    StreamingSink.applyBatch(b1, dir, Seq("k"), "ver", "ver")
    assert(readSnap(dir) == Seq((1L, 10.0, 1L), (2L, 20.0, 2L)))

    // newer version wins, older loses, new key appends
    val b2 = Seq((1L, 11.0, 3L), (2L, 19.0, 1L), (3L, 30.0, 1L)).toDF("k", "v", "ver")
    StreamingSink.applyBatch(b2, dir, Seq("k"), "ver", "ver")
    assert(readSnap(dir) == Seq((1L, 11.0, 3L), (2L, 20.0, 2L), (3L, 30.0, 1L)))

    // at-least-once replay of the same batch: no-op
    StreamingSink.applyBatch(b2, dir, Seq("k"), "ver", "ver")
    assert(readSnap(dir) == Seq((1L, 11.0, 3L), (2L, 20.0, 2L), (3L, 30.0, 1L)))
  }

  test("crash mid-swap is recoverable and blocks further applies until recovered") {
    val root = Files.createTempDirectory("snapr")
    val dir = root.toString + "/t"
    val b1 = Seq((1L, 10.0, 1L)).toDF("k", "v", "ver")
    StreamingSink.applyBatch(b1, dir, Seq("k"), "ver", "ver")
    // simulate a crash between the two renames
    Files.move(java.nio.file.Paths.get(dir), java.nio.file.Paths.get(dir + ".upsert_old"))
    intercept[IllegalArgumentException] {
      StreamingSink.applyBatch(b1, dir, Seq("k"), "ver", "ver")
    }
    assert(StreamingSink.recoverSnapshot(spark, dir))
    assert(readSnap(dir) == Seq((1L, 10.0, 1L)))
    StreamingSink.applyBatch(b1, dir, Seq("k"), "ver", "ver") // applies again fine
  }

  test("crash after a completed swap (lost cleanup) is also recoverable") {
    val root = Files.createTempDirectory("snapl")
    val dir = root.toString + "/t"
    val b1 = Seq((1L, 10.0, 1L)).toDF("k", "v", "ver")
    StreamingSink.applyBatch(b1, dir, Seq("k"), "ver", "ver")
    // simulate: swap finished but the .upsert_old delete was lost
    val stale = java.nio.file.Paths.get(dir + ".upsert_old")
    Files.createDirectory(stale)
    intercept[IllegalArgumentException] {
      StreamingSink.applyBatch(b1, dir, Seq("k"), "ver", "ver")
    }
    assert(StreamingSink.recoverSnapshot(spark, dir)) // drops the superseded dir
    assert(!Files.exists(stale))
    assert(readSnap(dir) == Seq((1L, 10.0, 1L))) // snapshot untouched
    StreamingSink.applyBatch(b1, dir, Seq("k"), "ver", "ver")
  }

  test("upsertSnapshot maintains the snapshot across micro-batches end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("snape").toString + "/t"
    val ckpt = Files.createTempDirectory("snapc").toString
    val input = MemoryStream[(Long, Double, Long)]
    val q = StreamingSink.upsertSnapshot(
      input.toDF().toDF("k", "v", "ver"), dir, ckpt, Seq("k"), "ver", "ver")
    try {
      input.addData((1L, 10.0, 1L), (2L, 20.0, 1L))
      q.processAllAvailable()
      input.addData((1L, 12.0, 2L), (3L, 30.0, 1L))
      q.processAllAvailable()
      assert(readSnap(dir) == Seq((1L, 12.0, 2L), (2L, 20.0, 1L), (3L, 30.0, 1L)))
    } finally q.stop()
  }

  test("leaders -> snapshot composition: update-mode upsert keyed on (g, rnk)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("snapld").toString + "/t"
    val ckpt = Files.createTempDirectory("snaplc").toString
    val input = MemoryStream[(String, Double, Long)]
    val leaders = StreamingLeaders.topKLeaders(
        input.toDF().toDF("g", "v", "id"), Seq("g"), $"v", $"id", k = 2)
      .withColumn("ver", lit(0L)) // constant version: update-mode ties resolve updates-first
    val q = StreamingSink.upsertSnapshot(
      leaders, dir, ckpt, Seq("g", "rnk"), "ver", "id", outputMode = "update")
    try {
      input.addData(("a", 5.0, 1L), ("a", 3.0, 2L))
      q.processAllAvailable()
      input.addData(("a", 9.0, 3L)) // evicts id=2 from rank 2, id=1 drops to rank 2
      q.processAllAvailable()
      val snap = spark.read.parquet(dir).orderBy("g", "rnk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      assert(snap == Seq(("a", 1L, 9.0, 3L), ("a", 2L, 5.0, 1L)))
    } finally q.stop()
  }

  test("topKLeaders keeps a bounded per-group leaderboard across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double, Long)]
    val leaders = StreamingLeaders.topKLeaders(
      input.toDF().toDF("g", "v", "id"), Seq("g"), $"v", $"id", k = 2)
    val q = leaders.writeStream
      .format("memory").queryName("leaders_test")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(("a", 1.0, 1L), ("a", 5.0, 2L), ("b", 7.0, 3L))
      q.processAllAvailable()
      val r1 = spark.table("leaders_test").orderBy("g", "rnk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      assert(r1 == Seq(("a", 1L, 5.0, 2L), ("a", 2L, 1.0, 1L), ("b", 1L, 7.0, 3L)))
      // a later batch evicts a leader — state carried the old heap over
      input.addData(("a", 9.0, 4L), ("a", 6.0, 5L))
      q.processAllAvailable()
      val r2 = spark.table("leaders_test").orderBy("g", "rnk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      assert(r2 == Seq(("a", 1L, 9.0, 4L), ("a", 2L, 6.0, 5L), ("b", 1L, 7.0, 3L)))
    } finally q.stop()
  }
}
