package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-inspection main: print a catalog query's physical plan without
  * executing it — `runMain graft.Explain <queryName> [sfDir] [mode]`.
  * The iteration loop the scale work runs on: after an operator change,
  * read the plan (PushedFilters, exchanges, WholeStageCodegen spans,
  * broadcast vs sort-merge) BEFORE trusting a timing delta. */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <queryName> [sfDir] [mode]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val mode = if (args.length > 2) args(2) else "formatted"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Graft.prepare(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // scalastyle:off println
    println(df.queryExecution.explainString(ExplainMode.fromString(mode)))
    // scalastyle:on println
    spark.stop()
  }
}
