package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.MilanCsvSource

class CensusSpec extends SparkSpec {

  test("census measure list matches the reference shape: 134 codes, gaps included") {
    val m = MilanCsvSource.censusMeasures
    assert(m.size == 134)
    assert(MilanCsvSource.censusSchema.fields.length == 135)
    assert(m.contains("P62") && !m.contains("P63") && m.contains("P64"), "P63 gap")
    assert(m.contains("P132") && !m.contains("P133") && m.contains("P135"), "P133-134 gap")
    assert(m.contains("A5") && !m.contains("A6") && m.contains("A44"), "A gaps")
    assert(m.last == "E27")
  }

  test("census CSV reads with the explicit schema and melts to long form") {
    val dir = Files.createTempDirectory("census").toFile
    val f = new java.io.File(dir, "ISTAT_census_variables_2011.csv")
    val header = ("PROVINCIA" +: MilanCsvSource.censusMeasures).mkString(",")
    val row1 = ("Milano" +: MilanCsvSource.censusMeasures.indices.map(i => (i + 1).toString)).mkString(",")
    val row2 = ("Torino" +: MilanCsvSource.censusMeasures.indices.map(i => (10 * (i + 1)).toString)).mkString(",")
    Files.writeString(f.toPath, s"$header\n$row1\n$row2\n")

    val df = MilanCsvSource.census(spark, f.getAbsolutePath)
    assert(df.schema == MilanCsvSource.censusSchema)
    assert(df.count() == 2)

    val long = MilanCsvSource.meltCensus(df)
    assert(long.columns.toSeq == Seq("provincia", "variable", "value"))
    assert(long.count() == 2 * 134)
    val p1 = long.filter(col("provincia") === "Milano" && col("variable") === "P1")
      .select("value").collect()(0).getLong(0)
    assert(p1 == 1L)
    val sumTorino = long.filter(col("provincia") === "Torino")
      .agg(sum("value")).collect()(0).getLong(0)
    assert(sumTorino == 10L * 134 * 135 / 2)
  }
}
