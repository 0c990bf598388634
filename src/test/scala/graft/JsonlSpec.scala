package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.JsonlSource

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def fixture(): String = {
    val dir = Files.createTempDirectory("jsonl").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "part-0.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("""{"id": 1, "text": "alpha"}""")
    w.println("""{"id": 2, "text": "beta", "extra": "ignored"}""") // schema prunes extras
    w.println("""{"id": broken""") // malformed
    w.println("""{"id": 3}""") // missing field → null, still clean
    w.close()
    f.getAbsolutePath
  }

  test("read splits clean and corrupt; schema is authoritative, no inference pass") {
    val path = fixture()
    val clean = JsonlSource.readClean(spark, path, schema)
      .as[(Option[Long], Option[String])].collect().toSet
    assert(clean == Set(
      (Some(1L), Some("alpha")), (Some(2L), Some("beta")), (Some(3L), None)))
    val corrupt = JsonlSource.readCorrupt(spark, path, schema)
      .as[String].collect().toSeq
    assert(corrupt == Seq("""{"id": broken"""))
    val stats = JsonlSource.corruptStats(spark, path, schema)
      .as[(Long, Long)].head()
    assert(stats == ((3L, 1L)))
  }

  test("write/read round-trip preserves rows; corrupt column rejected in schemas") {
    val out = Files.createTempDirectory("jsonl_out").toFile
    out.deleteOnExit()
    val df = Seq((1L, "alpha"), (2L, "line with \"quotes\" and\ttab")).toDF("id", "text")
    JsonlSource.write(df, out.getAbsolutePath)
    val back = JsonlSource.readClean(spark, out.getAbsolutePath, schema)
      .as[(Long, String)].collect().toSet
    assert(back == Set((1L, "alpha"), (2L, "line with \"quotes\" and\ttab")))
    intercept[IllegalArgumentException] {
      JsonlSource.read(spark, out.getAbsolutePath,
        schema.add(StructField(JsonlSource.CorruptCol, StringType)))
    }
  }
}
