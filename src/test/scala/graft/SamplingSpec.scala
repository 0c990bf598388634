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
}
