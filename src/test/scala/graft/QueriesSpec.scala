package graft

/** Smoke + contract checks over the harness-facing catalog. The value-level
  * correctness gate is the DuckDB oracle (scripts/local_verify.py mirrors
  * the driver); here we pin the catalog contract itself. */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every catalog query runs on sf0.001 and most return rows") {
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf).count()
    }
    val failures = counts.filter(_._2 < 0)
    assert(failures.isEmpty)
    // all but the audit-style queries (which can legitimately be small)
    // should be non-empty on the smoke scale
    val empty = counts.filter(_._2 == 0).map(_._1)
      .filterNot(Set("q10_anti_join", "q25_ngram_jaccard", "q29_embedding_near_dup"))
    assert(empty.isEmpty, s"unexpectedly empty: $empty")
  }
}
