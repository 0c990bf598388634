package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def fixture = Seq(
    // (group, ord, id) — group a has ties on ord, group b fewer rows than k
    ("a", 5.0, 10L), ("a", 5.0, 7L), ("a", 9.0, 3L), ("a", 1.0, 1L),
    ("a", 9.0, 4L), ("b", 2.0, 20L), ("b", 3.0, 21L)
  ).toDF("g", "v", "id")

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g")
      .agg(GraftFunctions.topK($"v", $"id", k).as("t"))
      .select($"g", posexplode($"t"))
      .select($"g", $"col.ord".as("v"), $"col.id".as("id"), ($"pos" + 1).as("rnk"))

  test("ranks by (ord desc, id asc) and truncates to k") {
    val got = topk(fixture, 3).orderBy("g", "rnk")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      ("a", 9.0, 3L, 1), ("a", 9.0, 4L, 2), ("a", 5.0, 7L, 3),
      ("b", 3.0, 21L, 1), ("b", 2.0, 20L, 2)))
  }

  test("null ord or id rows are skipped") {
    val df = Seq(
      (Some(1.0), Some(1L)), (None, Some(2L)), (Some(9.0), None)
    ).toDF("v", "id").withColumn("g", lit("x"))
    val got = topk(df, 5).collect()
    assert(got.length == 1 && got.head.getLong(2) == 1L)
  }

  test("result is independent of partition layout (merge path)") {
    val base = Tables.events(spark, sf)
      .select($"event_type".as("g"), $"value".as("v"), $"event_id".as("id"))
    val one = topk(base.coalesce(1), 5).orderBy("g", "rnk").collect().toSeq
    val many = topk(base.repartition(13), 5).orderBy("g", "rnk").collect().toSeq
    assert(one == many && one.nonEmpty)
  }

  test("matches the row_number window on real data") {
    val w = Window.partitionBy("event_type").orderBy($"value".desc, $"event_id".asc)
    val expected = Tables.events(spark, sf)
      .select($"event_type", $"event_id", $"value")
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 4)
      .select($"event_type", $"value", $"event_id", $"rnk")
      .orderBy("event_type", "rnk").collect().toSeq
    val got = topk(
      Tables.events(spark, sf)
        .select($"event_type".as("g"), $"value".as("v"), $"event_id".as("id")), 4)
      .select($"g".as("event_type"), $"v".as("value"), $"id".as("event_id"), $"rnk")
      .orderBy("event_type", "rnk").collect().toSeq
    assert(got == expected)
  }

  test("aggregates with partial (map-side) combine and no Window/Sort of input") {
    val plan = topk(
      Tables.events(spark, sf)
        .select($"event_type".as("g"), $"value".as("v"), $"event_id".as("id")), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$plan")
    assert(!plan.contains("Window"), s"window must not appear in:\n$plan")
  }

  test("property: equals the window for random data, duplicate ords, and many k") {
    val rnd = new scala.util.Random(42)
    // heavy ord duplication so tie-break paths are exercised constantly
    val rows = Seq.tabulate(3000)(i =>
      (s"g${rnd.nextInt(7)}", rnd.nextInt(20).toDouble, i.toLong))
    val df = rows.toDF("g", "v", "id").repartition(9)
    val w = Window.partitionBy("g").orderBy($"v".desc, $"id".asc)
    val ranked = df.withColumn("rnk", row_number().over(w))
    for (k <- Seq(1, 2, 17, 100, 5000)) {
      val expected = ranked.filter($"rnk" <= k)
        .select($"g", $"v", $"id", $"rnk".cast("int"))
        .orderBy("g", "rnk").collect().toSeq
      val got = topk(df, k)
        .select($"g", $"v", $"id", $"rnk".cast("int"))
        .orderBy("g", "rnk").collect().toSeq
      assert(got == expected, s"k=$k")
    }
  }

  test("graft_topk is SQL-callable after registration") {
    GraftFunctions.register(spark)
    fixture.createOrReplaceTempView("topk_test")
    val got = spark.sql(
      """SELECT g, t.ord, t.id FROM (
        |  SELECT g, graft_topk(v, id, 2) AS ts FROM topk_test GROUP BY g)
        |LATERAL VIEW explode(ts) AS t ORDER BY g, t.ord DESC, t.id""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("a", 9.0, 3L), ("a", 9.0, 4L), ("b", 3.0, 21L), ("b", 2.0, 20L)))
  }
}
