package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed storage must buy exchange-free joins and aggregations on the
  * bucket key — the persistent co-location contract. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joins and aggs on the bucket key run without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8, Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "b_lineitem", Seq("l_orderkey"), 8, Seq("l_orderkey"))
    try {
      val o = Bucketing.readTable(spark, "b_orders")
      val l = Bucketing.readTable(spark, "b_lineitem")
      // disable auto-broadcast so the join would OTHERWISE be a shuffle SMJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        // join + per-key aggregate, BOTH on the bucket key: the whole plan
        // must contain zero hash exchanges (join reads co-located buckets;
        // the aggregate's distribution is satisfied by the same bucketing)
        val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy(o("o_orderkey"))
          .agg(count(lit(1)).as("n"))
        assert(Bucketing.isExchangeFree(joined),
          "bucketed join+agg on the bucket key should plan with no hash exchange:\n" +
            joined.queryExecution.executedPlan.toString.take(2000))
        // and the result matches the unbucketed computation
        val expected = lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
          .groupBy(orders("o_orderkey")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val got = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
