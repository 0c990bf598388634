package graft

import org.apache.spark.sql.functions._
import graft.operators.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("score sums agree/disagree weights per rule exactly") {
    val pairs = Seq(
      (1L, 2L, 0, 10, 10), // exact name, same nation
      (1L, 3L, 1, 10, 20), // variant name, different nation
      (2L, 3L, 1, 10, 10)
    ).toDF("id_a", "id_b", "dist", "nat_a", "nat_b")
    val got = Linkage.score(pairs, Seq(
      Linkage.FieldRule("name", col("dist") === 0, 4000L, 2500L),
      Linkage.FieldRule("nation", col("nat_a") === col("nat_b"), 1200L, -800L)))
      .select("id_a", "id_b", "score").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 5200L), (1L, 3L, 1700L), (2L, 3L, 3700L)))
  }

  test("score requires at least one rule, null agreement counts as disagree") {
    intercept[IllegalArgumentException] {
      Linkage.score(Seq((1L, 2L)).toDF("id_a", "id_b"), Seq.empty)
    }
    // a null field comparison is not agreement — it must take wDisagree
    val p = Seq((1L, 2L, Option.empty[Int], Option(5))).toDF("id_a", "id_b", "x", "y")
    val s = Linkage.score(p, Seq(
      Linkage.FieldRule("f", col("x") === col("y"), 100L, -50L)))
      .select("score").as[Long].head()
    assert(s == -50L)
  }
}
