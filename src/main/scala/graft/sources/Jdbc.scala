package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC interop leg — the reference's warehouse-facing surface
  * (pandas `to_sql` chunked append, reference src/etl.py:171-177 with
  * chunksize=1000 and :268-273 with chunksize=100; `read_sql` probe,
  * src/etl.py:16 and the existence guard at :286-292) re-expressed
  * through Spark's JDBC relation.
  *
  * The engine itself stays parquet-native; these wrappers are for the
  * user who points it at the reference's actual Postgres-style warehouse:
  * same chunked-append semantics (`batchsize` is the executemany chunk,
  * the direct analog of `to_sql(chunksize=…)`), same probe-then-skip
  * idempotency guard, plus the one thing the pandas leg fundamentally
  * lacks — PARTITIONED reads/writes, so a 1000-executor cluster opens
  * 1000 bounded cursors instead of one driver-side fetch loop.
  */
object JdbcSource {

  /** Full-table read through ONE connection — the `read_sql` shape; fine
    * for dimensions, wrong for facts (see [[readPartitioned]]). */
  def read(
      spark: SparkSession,
      url: String,
      table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Partitioned parallel read: `numPartitions` executors each scan one
    * stride of `[lower, upper]` on `partitionCol` (WHERE-clause pushdown
    * per partition — the JDBC source plans one bounded query per stride).
    * This is the ONLY read shape that survives a fact-table-sized source:
    * the single-cursor form funnels every row through the driver's
    * fetch loop. */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionCol: String,
      lower: Long,
      upper: Long,
      numPartitions: Int,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)

  /** Row-count probe with the count pushed down to the database (a 1-row
    * subquery scan, not a Spark-side count over a full table read) — the
    * `read_sql("SELECT COUNT(*) …")` existence probe. */
  def count(
      spark: SparkSession,
      url: String,
      table: String,
      props: Properties = new Properties()): Long =
    spark.read
      .jdbc(url, s"(SELECT COUNT(*) AS n FROM $table) probe", props)
      // COUNT(*)'s SQL type is dialect-specific (Derby INTEGER, Postgres
      // BIGINT) — widen through Number instead of assuming one
      .head().getAs[Number](0).longValue()
}

object JdbcSink {

  /** Chunked append — `to_sql(if_exists='append', chunksize=batchSize)`
    * parity: `batchsize` is the JDBC executemany batch each task flushes,
    * and each of the DataFrame's partitions writes through its own
    * connection in parallel (the pandas leg is single-connection).
    * Creates the table when absent, appends otherwise. */
  def append(
      df: DataFrame,
      url: String,
      table: String,
      batchSize: Int = 1000,
      props: Properties = new Properties()): Unit = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val p = new Properties()
    p.putAll(props)
    p.setProperty("batchsize", batchSize.toString)
    df.write.mode(SaveMode.Append).jdbc(url, table, p)
  }

  /** The reference's idempotency guard through the JDBC leg
    * (src/etl.py:286-292: probe the count, skip the load when the table
    * already has rows): appends only when `table` is missing or empty.
    *
    * @return true when the append ran, false when the guard skipped it.
    */
  def appendIfEmpty(
      df: DataFrame,
      url: String,
      table: String,
      batchSize: Int = 1000,
      props: Properties = new Properties()): Boolean = {
    val existing =
      try JdbcSource.count(df.sparkSession, url, table, props)
      catch {
        case probeFailure: Exception =>
          // Disambiguate "table missing" (first load — append creates it)
          // from a TRANSIENT probe failure (network blip, pool exhaustion):
          // treating the latter as empty would re-append every row into a
          // table the guard exists to protect. The driver-specific
          // exception chains don't distinguish the two, so ask the
          // database directly on a fresh connection: if the zero-row
          // existence query also fails, the table is genuinely absent; if
          // it succeeds (or the connection can't even open), the original
          // failure was NOT "missing table" — rethrow it and let the
          // caller retry rather than double-load.
          if (tableMissing(url, table, props, probeFailure)) 0L
          else throw probeFailure
      }
    if (existing > 0L) false
    else { append(df, url, table, batchSize, props); true }
  }

  /** True iff a fresh connection opens AND `SELECT ... WHERE 1=0` on
    * `table` fails — the only state that licenses treating a failed count
    * probe as "first load". */
  private def tableMissing(
      url: String,
      table: String,
      props: Properties,
      probeFailure: Exception): Boolean = {
    val conn =
      try java.sql.DriverManager.getConnection(url, props)
      catch { case _: Exception => throw probeFailure } // infra down — not "missing"
    try {
      val st = conn.createStatement()
      try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0").close(); false }
      catch { case _: java.sql.SQLException => true }
      finally st.close()
    } finally conn.close()
  }
}
