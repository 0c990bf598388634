package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.plans.GraftFunctions

class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
    (1L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
    (2L, Array(0.5f, 0.5f), Array(0.5f, 0.5f))
  ).toDF("id", "a", "b")

  test("CosineSimilarity matches the higher-order-function cosine") {
    val rows = vecs.select(
      GraftFunctions.cosineFast($"a", $"b").as("fast"),
      VectorFunctions.cosine($"a", $"b").as("hof")
    ).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("CosineSimilarity participates in codegen (no CodegenFallback)") {
    val plan = vecs.select(GraftFunctions.cosineFast($"a", $"b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"))
  }

  test("graft_cosine is SQL-callable after registration") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_test")
    val got = spark.sql("SELECT id, graft_cosine(a, b) AS c FROM vecs_test ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(math.abs(got(0)._2 - 10.0 / 14.0) < 1e-12) // dot 10, norms sqrt(14) each
    assert(got(1)._2 == 0.0)
    assert(math.abs(got(2)._2 - 1.0) < 1e-12)
  }

  test("interpreted eval agrees with codegen result") {
    // force interpreted path through the expression's nullSafeEval
    val e = graft.plans.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2.0f, 4.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    )
    val v = e.eval(null).asInstanceOf[Double]
    assert(math.abs(v - 1.0) < 1e-12)
  }
}
