package graft

import org.apache.spark.sql.functions._
import graft.operators.Diagnostics

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def df(grp: String, vs: Seq[Double]) = vs.map((grp, _)).toDF("g", "v")

  test("ksDrift is zero for identical samples and maximal for disjoint ones") {
    val a = df("g", Seq(1.0, 2.0, 3.0, 7.0))
    val same = Diagnostics.ksDrift(a, a, Seq("g"), col("v"), bins = 8, lo = 0.0, hi = 8.0)
      .select("n_a", "n_b", "ks_stat").as[(Long, Long, Double)].head()
    assert(same == ((4L, 4L, 0.0)))

    // A entirely in low bins, B entirely in high bins → sup |cdfA - cdfB| = 1
    val apart = Diagnostics.ksDrift(
        df("g", Seq(0.5, 1.5)), df("g", Seq(6.5, 7.5)),
        Seq("g"), col("v"), bins = 8, lo = 0.0, hi = 8.0)
      .select("ks_stat").as[Double].head()
    assert(apart == 1.0)
  }

  test("ksDrift numerator is the exact cross-multiplied CDF gap") {
    // bins of width 1 over [0,4): A = {0,1,2}, B = {0,3,3}
    // cum A = 1,2,3,3 ; cum B = 1,1,1,3 ; nA=3 nB=3
    // |cumA*nB - cumB*nA| per bin = 0,3,6,0 → ks_num 6, ks = 6/9
    val out = Diagnostics.ksDrift(
        df("g", Seq(0.5, 1.5, 2.5)), df("g", Seq(0.5, 3.5, 3.5)),
        Seq("g"), col("v"), bins = 4, lo = 0.0, hi = 4.0)
      .select("ks_num", "ks_stat").as[(java.math.BigDecimal, Double)].head()
    assert(out._1.longValueExact == 6L)
    assert(out._2 == 6.0 / 9.0)
  }

  test("ksDrift drops one-sided groups and is independent of partition layout") {
    val a = df("both", Seq(1.0, 2.0)).union(df("onlyA", Seq(3.0)))
    val b = df("both", Seq(5.0, 6.0))
    val out = Diagnostics.ksDrift(a, b, Seq("g"), col("v"), bins = 8, lo = 0.0, hi = 8.0)
    assert(out.select("g").as[String].collect().toSeq == Seq("both"))

    val re = Diagnostics.ksDrift(
      a.repartition(7, col("v")), b.repartition(3, col("v")),
      Seq("g"), col("v"), bins = 8, lo = 0.0, hi = 8.0)
    assert(re.collect().toSeq == out.collect().toSeq)
  }

  test("ksDrift clamps out-of-range values into the edge bins") {
    // -5 clamps to bin 0, 99 clamps to the top bin: both still counted
    val out = Diagnostics.ksDrift(
        df("g", Seq(-5.0, 99.0)), df("g", Seq(0.5, 7.9)),
        Seq("g"), col("v"), bins = 8, lo = 0.0, hi = 8.0)
      .select("n_a", "n_b").as[(Long, Long)].head()
    assert(out == ((2L, 2L)))
  }
}
