package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The catalog itself lives in [[Queries]]; this object is the stable
  * harness-facing surface.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (the reference's acceptance
    * query shape, get_top_cells — reference src/etl.py:283-299); driver
    * smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("q03_top_users")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — including the sketch ops (q26 MinHash,
    * q27 SimHash, q30 LSH ANN), whose xxhash64/splitmix64 pipelines are
    * ported to DuckDB SQL in [[DuckHash]]. */
  def oracleSql: Map[String, String] = Queries.oracles
}
