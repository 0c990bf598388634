package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

class VectorQuantSpec extends SparkSpec {
  import spark.implicits._

  private def quant(vec: Seq[Float]): (Double, Seq[Long], Double) = {
    val df = Seq(Tuple1(vec)).toDF("v")
      .select(transform(col("v"), x => x.cast("double")).as("v"))
      .withColumn("absmax", VectorFunctions.absMax(col("v")))
      .withColumn("qs", VectorFunctions.int8Quantize(col("v"), col("absmax")))
      .withColumn("err", VectorFunctions.int8MaxError(col("v"), col("qs"), col("absmax")))
    val r = df.select("absmax", "qs", "err").as[(Double, Seq[Long], Double)].head()
    r
  }

  test("absmax element maps to ±127 exactly; zero stays zero") {
    val (am, qs, _) = quant(Seq(1.0f, -1.0f, 0.0f, 0.5f))
    assert(am == 1.0)
    assert(qs == Seq(127L, -127L, 0L, 63L)) // floor(0.5*127) = 63
  }

  test("all-zero vector quantizes to zeros with zero error") {
    val (am, qs, err) = quant(Seq(0.0f, 0.0f))
    assert(am == 0.0 && qs == Seq(0L, 0L) && err == 0.0)
  }

  test("reconstruction error bounded by one quantization step") {
    val (am, qs, err) = quant(Seq(0.9f, -0.37f, 0.001f, 0.25f))
    assert(qs.forall(q => q >= -127 && q <= 127))
    assert(err >= 0.0 && err <= am / 127 + 1e-12) // floor ⇒ step-bounded
  }

  test("negative absmax element saturates the negative rail") {
    val (_, qs, _) = quant(Seq(-2.0f, 1.0f))
    assert(qs == Seq(-127L, 63L)) // floor(1/2*127) = 63
  }
}
