package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table storage: the PERSISTENT form of the engine's co-location
  * strategy (the in-query form is `Tables.spread`'s load-time hash
  * repartition). Writing two fact tables bucketed by their join key means
  * every future join/groupBy on that key is EXCHANGE-FREE — at 100 TB the
  * shuffle this removes is the dominant cost of the nightly join pipeline,
  * and bucket pruning serves point lookups on the key.
  *
  * This is the Spark-native answer to the reference's PostgreSQL b-tree
  * indexes (reference `src/database.py:114-120`): the index accelerated its
  * joins/filters inside one server; bucketing co-locates them across a
  * cluster.
  *
  * Bucketed writes go through the session catalog (`saveAsTable` — parquet
  * files + bucket metadata in the metastore), which is what makes the
  * bucket spec durable and trusted by the planner across sessions.
  */
object Bucketing {

  /** Write `df` as a bucketed, optionally sorted catalog table. Sorting
    * within buckets additionally enables exchange-AND-sort-free sort-merge
    * joins. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val w0 = df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val w1 = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*) else w0
    w1.saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides along from the
    * catalog, so the planner can elide exchanges). */
  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when a physical plan contains no shuffle exchange — the property
    * bucketed joins buy. Exposed for tests and plan audits. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
