package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingRollup

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("hourlyWindow aggregates a stream into tumbling hour windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
    val rolled = StreamingRollup.hourlyWindow(df, "ts", Seq("user_id"), "value")
    val q = rolled.writeStream
      .format("memory")
      .queryName("hourly_test")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), 1L, 2.0),
        (Timestamp.valueOf("2024-01-01 10:55:00"), 1L, 3.0),
        (Timestamp.valueOf("2024-01-01 11:05:00"), 1L, 7.0),
        (Timestamp.valueOf("2024-01-01 10:15:00"), 2L, 1.0)
      )
      q.processAllAvailable()
      val out = spark.table("hourly_test")
        .collect()
        .map(r => (r.getAs[Timestamp]("hour").toString, r.getAs[Long]("user_id"), r.getAs[Double]("total_value")))
        .toSet
      assert(out == Set(
        ("2024-01-01 10:00:00.0", 1L, 5.0),
        ("2024-01-01 11:00:00.0", 1L, 7.0),
        ("2024-01-01 10:00:00.0", 2L, 1.0)
      ))
    } finally q.stop()
  }
}
