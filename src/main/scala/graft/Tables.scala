package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness test tables (`TESTDATA.md`): a TPC-H-ish star
  * schema plus `events` (stream-shaped), `documents` and `embeddings`
  * (LLM-pipeline tables). Every loader goes through [[Graft.prepare]] so the
  * catalog queries are self-contained regardless of who built the session.
  */
object Tables {

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    Graft.prepare(spark)
    spark.read.parquet(path(dir, name))
  }

  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** `events.parquet` carries TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong` the physical int64 arrives as a
    * LongType of nanoseconds, which we truncate to microseconds — the same
    * truncation DuckDB applies when it reads nanos into its native
    * microsecond timestamp, so oracle comparisons line up exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
}
