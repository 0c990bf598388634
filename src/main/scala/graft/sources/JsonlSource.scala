package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines interop — the interchange format crawl dumps, API exports,
  * and LLM training corpora actually arrive in. Always schema-EXPLICIT:
  * `spark.read.json` without a schema runs a full inference pass over
  * the data (a second 100 TB scan before the first real one) and infers
  * whatever the sample happens to contain; every reader here takes a
  * `StructType` so the scan is single-pass and the schema is a reviewed
  * artifact, the same discipline as `MilanCsvSource`'s explicit CSV
  * schemas.
  *
  * Malformed lines are data, not exceptions, at corpus scale: [[read]]
  * captures them in a corrupt-record column (PERMISSIVE mode) so the
  * pipeline can quarantine and count them ([[corruptStats]]) instead of
  * failing the job (FAILFAST) or silently dropping them (DROPMALFORMED).
  */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL with an explicit schema; malformed lines land whole in
    * `_corrupt_record` with every data column null.
    *
    * Built on the TEXT source + `from_json` (row-local, codegen) rather
    * than `spark.read.json`'s PERMISSIVE mode: the json source refuses
    * any query whose projection reaches only the corrupt column
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the quarantine scan
    * [[readCorrupt]] is exactly that query), and the documented cache()
    * workaround is not a 100 TB plan. Line splitting, schema pruning and
    * the corrupt verdict all stay on the scan. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already contains $CorruptCol")
    val parseSchema = schema.add(StructField(CorruptCol, StringType, nullable = true))
    spark.read.text(path)
      .select(from_json(col("value"), parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)).as("__parsed"))
      .select(parseSchema.fieldNames.map(f => col(s"__parsed.`$f`").as(f)): _*)
  }

  /** The clean rows of [[read]] (corrupt column dropped). */
  def readClean(spark: SparkSession, path: String, schema: StructType): DataFrame =
    read(spark, path, schema).filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantine side: one row per malformed input line, verbatim. */
  def readCorrupt(spark: SparkSession, path: String, schema: StructType): DataFrame =
    read(spark, path, schema)
      .filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))

  /** (n_clean, n_corrupt) in ONE pass — the load-acceptance check (the
    * reference's row-count acceptance query, src/etl.py:283-291, for a
    * source that can be per-line broken). */
  def corruptStats(spark: SparkSession, path: String, schema: StructType): DataFrame =
    read(spark, path, schema)
      .agg(
        sum(when(col(CorruptCol).isNull, 1L).otherwise(0L)).as("n_clean"),
        sum(when(col(CorruptCol).isNotNull, 1L).otherwise(0L)).as("n_corrupt"))

  /** Write as JSONL (one object per line, overwrite) — the export leg.
    * Spark writes one file per partition: `coalesce` upstream when a
    * single interchange file is required. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
