package graft

import org.apache.spark.sql.functions._

import graft.functions.PiiFunctions

/** PII detection/redaction golden cases — the catalog's q52 oracle checks
  * corpus-wide parity; here we pin the pattern semantics themselves. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): (Long, Long, Long, String) = {
    val r = Seq(text).toDF("text")
      .select(
        PiiFunctions.emailCount(col("text")).as("e"),
        PiiFunctions.phoneCount(col("text")).as("p"),
        PiiFunctions.ipv4Count(col("text")).as("i"),
        PiiFunctions.redact(col("text")).as("r"))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("emails are counted and redacted") {
    val (e, p, i, r) = one("write to alice.smith+tag@sub.example.co today")
    assert((e, p, i) == (1L, 0L, 0L))
    assert(r == "write to <EMAIL> today")
  }

  test("NANP phones with - and . separators") {
    val (e, p, i, r) = one("call 415-555-0123 or 415.555.0124 now")
    assert((e, p, i) == (0L, 2L, 0L))
    assert(r == "call <PHONE> or <PHONE> now")
  }

  test("dotted-quad IPv4; a dotted phone is NOT an IP") {
    val (e, p, i, r) = one("from 10.20.0.5 via 415.555.0124")
    assert((e, p, i) == (0L, 1L, 1L))
    assert(r == "from <IP> via <PHONE>")
  }

  test("word boundary: longer digit runs do not partially match") {
    val (_, p, i, _) = one("id 1234-567-89012 and version 1.2.3.4567x")
    assert(p == 0L) // 4-digit first group: no \b-anchored 3-3-4 parse exists
    assert(i == 0L) // last octet would need to stop mid-digit-run: \b fails
  }

  test("clean text is untouched") {
    val (e, p, i, r) = one("no pii here at all")
    assert((e, p, i) == (0L, 0L, 0L))
    assert(r == "no pii here at all")
  }

  test("multiple classes in one document redact in contract order") {
    val (e, p, i, r) = one("a@b.io then 555-123-4567 then 8.8.8.8")
    assert((e, p, i) == (1L, 1L, 1L))
    assert(r == "<EMAIL> then <PHONE> then <IP>")
  }
}
