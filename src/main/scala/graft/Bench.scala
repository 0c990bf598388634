package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: executes every catalog query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query seconds.
  *
  * Queries are fully executed via the `noop` sink (forces every projected
  * column to be computed — `count()` would let Catalyst prune the very
  * expressions we want to measure). A warm-up run of the smallest query
  * amortizes session/codegen start-up out of the per-query numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Graft.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); return -1.0 }
      val t = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name $t%.2fs")
      t
    }

    // Warm-up: JVM/codegen/parquet-footer caches.
    run("q16_distinct_flags")

    // INTERLEAVED best-of-N (default 3 passes, up to 6): this host shows
    // episodic multi-MINUTE degradation windows (all tasks drop to
    // interpreted speed — verified via jstack/jstat: C2 compiler pegged,
    // previously sub-second queries take 20-60s, then recover). Repeating
    // one query back-to-back lands every repeat inside the same window, so
    // min-of-3 still reports the degraded time. Instead run the FULL
    // catalog once per pass and take each query's min across passes: the
    // query's samples are then spaced a whole pass apart, and a single
    // calm pass anywhere yields calm minima for every query. If no pass
    // was calm (best pass-sum still far above the sum of minima), keep
    // adding passes up to the cap. A query is reported failed (-1) only
    // when it fails in EVERY pass.
    val basePasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val maxPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_RUNS", "6").toInt
    val names = SparkEntry.queries.keys.toSeq.sorted
    val best = scala.collection.mutable.Map[String, Double]().withDefaultValue(-1.0)
    var pass = 0
    var calmSeen = false
    while (pass < basePasses || (pass < maxPasses && !calmSeen)) {
      var passSum = 0.0
      names.foreach { n =>
        val t = run(n)
        if (t >= 0) {
          passSum += t
          if (best(n) < 0 || t < best(n)) best(n) = t
        }
      }
      val minTotal = names.map(best(_)).filter(_ >= 0).sum
      // A calm pass's sum sits within ~30% of the sum-of-minima; a pass
      // that crossed a degradation window is 2x+ above it.
      calmSeen = calmSeen || (minTotal > 0 && passSum <= 1.3 * minTotal)
      pass += 1
      System.err.println(f"[bench] pass $pass sum $passSum%.1fs minTotal $minTotal%.1fs calm=$calmSeen")
    }
    val results = names.map(n => n -> best(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
