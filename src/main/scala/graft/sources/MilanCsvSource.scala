package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV sources for the reference's day-file feeds (SURVEY.md §2.1 S1/S2/S6).
  *
  * Schemas are explicit (never inferSchema in a production path — one
  * malformed file would silently flip column types); `datetime` is read as
  * string and coerced by the cleaning layer, mirroring the reference's
  * pandas `read_csv` + `to_datetime(errors='coerce')` split
  * (reference `src/etl.py:128,134`).
  */
object MilanCsvSource {

  /** Traffic day-file schema (notebook cell 6; FIXTURES.md §1). */
  val trafficSchema: StructType = StructType(Seq(
    StructField("datetime", StringType),
    StructField("CellID", LongType),
    StructField("countrycode", LongType),
    StructField("smsin", DoubleType),
    StructField("smsout", DoubleType),
    StructField("callin", DoubleType),
    StructField("callout", DoubleType),
    StructField("internet", DoubleType)
  ))

  /** Mobility day-file schema (notebook cell 7; FIXTURES.md §2). */
  val mobilitySchema: StructType = StructType(Seq(
    StructField("datetime", StringType),
    StructField("CellID", LongType),
    StructField("provinceName", StringType),
    StructField("cell2Province", DoubleType),
    StructField("Province2cell", DoubleType)
  ))

  /** S6 — file discovery: glob + lexicographic sort (= chronological for
    * the reference's date-named files) + head-N
    * (reference src/etl.py:111-115). Driver-side listing; the explicit path
    * list goes to one distributed csv() read — per-file parallelism instead
    * of the reference's sequential per-file loop. */
  def discover(dir: String, globPattern: String, limitFiles: Option[Int] = None): Seq[String] = {
    val matcher = java.nio.file.FileSystems.getDefault
      .getPathMatcher(s"glob:$globPattern")
    val base = Paths.get(dir)
    if (!Files.isDirectory(base)) return Seq.empty
    val files = Files.list(base).iterator().asScala
      .filter(p => matcher.matches(p.getFileName))
      .map(_.toString)
      .toSeq
      .sorted
    limitFiles.fold(files)(files.take)
  }

  private def readCsv(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .schema(schema)
      .csv(paths: _*)
      // per-file lineage — the reference tracks per-file rejected counts
      .withColumn("source_file", input_file_name())

  def traffic(spark: SparkSession, paths: Seq[String]): DataFrame =
    readCsv(spark, trafficSchema, paths)

  def mobility(spark: SparkSession, paths: Seq[String]): DataFrame =
    readCsv(spark, mobilitySchema, paths)

  // --- S3: ISTAT census wide table (notebook cell 9/15: 110 rows × 135
  // cols, `PROVINCIA` + 134 int64 demographic measures; the variable-code
  // list has gaps — P63, P67-P127 etc. are absent from the 2011 extract).

  /** The 134 measure codes, verbatim from the reference profiling output
    * (notebook cell 15). */
  val censusMeasures: Seq[String] =
    ((1 to 62) ++ Seq(64, 65, 66) ++ (128 to 132) ++ (135 to 140)).map(i => s"P$i") ++
      (1 to 15).map(i => s"ST$i") ++
      (Seq(2, 3, 5, 44, 46, 47, 48)).map(i => s"A$i") ++
      (1 to 9).map(i => s"PF$i") ++
      (1 to 27).map(i => s"E$i")

  /** Explicit 135-column schema — integers are read as LongType (pandas
    * int64); a narrower IntegerType would silently null 2^31+ counts under
    * non-ANSI coercion. */
  val censusSchema: StructType = StructType(
    StructField("PROVINCIA", StringType) +:
      censusMeasures.map(c => StructField(c, LongType))
  )

  def census(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(censusSchema).csv(path)

  /** Wide → long melt: (provincia, variable, value) — the generic
    * per-variable analytics shape (SURVEY.md §1.3). One `stack` Generator,
    * no shuffle; 110×134 output rows. */
  def meltCensus(df: DataFrame): DataFrame =
    graft.operators.Cleaning
      .melt(df, Seq("PROVINCIA"), censusMeasures)
      .withColumnRenamed("PROVINCIA", "provincia")
}
