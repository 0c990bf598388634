package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{JdbcSink, JdbcSource}

/** The JDBC interop leg against an in-JVM embedded Derby (the sandbox has
  * no Postgres; Derby exercises the identical Spark JDBC relation +
  * dialect machinery): chunked append, read-back parity, the partitioned
  * parallel read, and the reference's probe-then-skip idempotency guard
  * (reference src/etl.py:171-177, :286-292). */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir = {
    val d = Files.createTempDirectory("graft-derby").toFile
    // derby.log otherwise lands in the process cwd (the repo root)
    System.setProperty("derby.system.home", d.getAbsolutePath)
    d
  }
  private lazy val url = s"jdbc:derby:${dbDir.getAbsolutePath}/graftdb;create=true"

  private def fixture = (1 to 50)
    .map(i => (i.toLong, s"name_$i", i * 1.5))
    .toDF("id", "name", "v")

  test("chunked append round-trips through Derby (batchsize < row count)") {
    val written = JdbcSink.appendIfEmpty(fixture, url, "t_roundtrip", batchSize = 7)
    assert(written, "first load must run")
    val back = JdbcSource.read(spark, url, "t_roundtrip")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = fixture.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(back.toSeq == expected.toSeq)
  }

  test("idempotency guard: re-running the load is a no-op") {
    JdbcSink.appendIfEmpty(fixture, url, "t_guard", batchSize = 10)
    val second = JdbcSink.appendIfEmpty(fixture, url, "t_guard", batchSize = 10)
    assert(!second, "guard must skip a non-empty table")
    assert(JdbcSource.count(spark, url, "t_guard") == 50L)
  }

  test("unguarded append really appends (the guard is the only idempotency)") {
    JdbcSink.append(fixture, url, "t_append", batchSize = 25)
    JdbcSink.append(fixture, url, "t_append", batchSize = 25)
    assert(JdbcSource.count(spark, url, "t_append") == 100L)
  }

  test("partitioned read returns the same rows across N bounded cursors") {
    JdbcSink.appendIfEmpty(fixture, url, "t_part", batchSize = 50)
    val part = JdbcSource.readPartitioned(
      spark, url, "t_part", partitionCol = "id", lower = 1L, upper = 50L, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.agg(count(lit(1)), sum(col("id"))).head().toSeq == Seq(50L, 1275L))
  }

  test("count probe pushes the aggregate into the database (1-row scan)") {
    JdbcSink.appendIfEmpty(fixture, url, "t_probe", batchSize = 50)
    assert(JdbcSource.count(spark, url, "t_probe") == 50L)
  }

  test("append rejects a non-positive batch size") {
    intercept[IllegalArgumentException] {
      JdbcSink.append(fixture, url, "t_bad", batchSize = 0)
    }
  }
}
