package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Rollup

class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fact = Seq(
    (ts("2013-11-01 00:05:00"), 1, 1.0, 2.0, 0.0, 0.0, 10.0),
    (ts("2013-11-01 00:55:00"), 1, 3.0, 0.0, 1.0, 0.0, 0.0),
    (ts("2013-11-01 01:05:00"), 1, 5.0, 0.0, 0.0, 0.0, 0.0),
    (ts("2013-11-01 00:05:00"), 2, 7.0, 0.0, 0.0, 1.0, 0.0)
  ).toDF("datetime", "cell_id", "smsin", "smsout", "callin", "callout", "internet")

  test("hourlyTraffic reproduces v_hourly_traffic sums per (hour, cell)") {
    val h = Rollup.hourlyTraffic(fact).orderBy("hour", "cell_id").collect()
    assert(h.length == 3)
    val first = h(0) // 00:00, cell 1
    assert(first.getAs[Timestamp]("hour") == ts("2013-11-01 00:00:00"))
    assert(first.getAs[Double]("total_smsin") == 4.0)
    assert(first.getAs[Double]("total_activity") == 17.0)
    val second = h(1) // 00:00, cell 2
    assert(second.getAs[Double]("total_activity") == 8.0)
  }

  test("topCells filters by hour, averages per cell, orders desc with limit") {
    val hourly = Rollup.hourlyTraffic(fact)
    val top = Rollup.topCells(hourly, lit("2013-11-01 00:00:00").cast("timestamp"), 2).collect()
    // cell 1: hours (17, 5) → avg 11; cell 2: 8 → avg 8
    assert(top.length == 2)
    assert(top(0).getAs[Int]("cell_id") == 1)
    assert(top(0).getAs[Double]("avg_load") == 11.0)
    assert(top(1).getAs[Int]("cell_id") == 2)
  }

  test("total_activity equals sum of raw metrics after NaN→0 fill (invariant)") {
    val h = Rollup.hourlyTraffic(fact)
    val total = h.agg(sum("total_activity")).as[Double].collect()(0)
    val raw = fact.select(
      (col("smsin") + col("smsout") + col("callin") + col("callout") + col("internet")).as("t")
    ).agg(sum("t")).as[Double].collect()(0)
    assert(total == raw)
  }
}
