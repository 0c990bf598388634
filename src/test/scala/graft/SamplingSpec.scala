package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("rebalanceToSmallest keeps the smallest group whole and downsamples the rest") {
    val rows = (0L until 100L).map(i => (i, "big")) ++ (100L until 110L).map(i => (i, "small"))
    val df = rows.toDF("id", "grp")
    val out = Sampling.rebalanceToSmallest(df, "id", "grp", salt = 13L)
      .select("id", "grp").as[(Long, String)].collect()

    // smallest group: bucket·cnt < Buckets·target degenerates to bucket < Buckets → all kept
    assert(out.count(_._2 == "small") == 10)

    // big group: exactly the rows satisfying the integer inequality survive
    val expectedBig = df.filter(col("grp") === "big")
      .filter(Sampling.hashBucket(col("id"), 13L) * 100L < Sampling.Buckets * 10L)
      .select("id").as[Long].collect().toSet
    assert(out.filter(_._2 == "big").map(_._1).toSet == expectedBig)
    // the derived ~10% rate actually thins the group (hash-dependent, but
    // binomial(100, 0.1) stays well inside [1, 30])
    assert(expectedBig.size >= 1 && expectedBig.size <= 30)

    // deterministic: a second run selects the identical rows
    val again = Sampling.rebalanceToSmallest(df, "id", "grp", salt = 13L)
      .select("id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet)
  }

  test("rebalanceToTarget matches the weight mixture, keeps the binding group whole") {
    // a:2000 b:500 c:300 rows; target 2:1:1 → binding is c (300/1 < 500/1,
    // 2000/2); expected kept ≈ a:600 b:300 c:300
    val df = ((1L to 2000L).map(("a", _)) ++ (10001L to 10500L).map(("b", _)) ++
      (20001L to 20300L).map(("c", _))).toDF("grp", "id")
    val kept = Sampling.rebalanceToTarget(
      df, "id", "grp", Map("a" -> 2L, "b" -> 1L, "c" -> 1L), salt = 5L)
    val byGrp = kept.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp("c") == 300L) // binding group never thinned
    assert(math.abs(byGrp("a") - 600L) < 60, s"a kept ${byGrp("a")}")
    assert(math.abs(byGrp("b") - 300L) < 40, s"b kept ${byGrp("b")}")
    // achieved mixture ~2:1:1
    assert(math.abs(byGrp("a").toDouble / byGrp("c") - 2.0) < 0.25)
    // no invented rows, deterministic under repartition
    assert(kept.exceptAll(df).count() == 0)
    val again = Sampling.rebalanceToTarget(
      df.repartition(9, col("id")), "id", "grp",
      Map("a" -> 2L, "b" -> 1L, "c" -> 1L), salt = 5L)
    assert(again.select("id").as[Long].collect().sorted.toSeq ==
      kept.select("id").as[Long].collect().sorted.toSeq)
  }

  test("rebalanceToTarget drops unweighted groups and validates weights") {
    val df = Seq(("a", 1L), ("x", 2L)).toDF("grp", "id")
    val kept = Sampling.rebalanceToTarget(df, "id", "grp", Map("a" -> 1L))
    assert(kept.select("grp").as[String].collect().toSeq == Seq("a"))
    intercept[IllegalArgumentException] {
      Sampling.rebalanceToTarget(df, "id", "grp", Map("a" -> 0L))
    }
  }
}
