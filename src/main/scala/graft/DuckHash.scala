package graft

/** DuckDB-side ports of the engine's 64-bit hash primitives, as SQL-text
  * generators — so the sketch operators (MinHash q26, SimHash q27, LSH ANN
  * q30) get REAL value-level oracles instead of rows-only checks.
  *
  * Everything is a single-statement SQL fragment (the driver runs one
  * statement per oracle): wrap-around u64 arithmetic is emulated with
  * HUGEINT intermediates mod 2^64 (DuckDB checks overflow on UBIGINT, so
  * 64-bit multiplies are split into 32-bit halves), and multi-step hashing
  * is staged through chained CTE columns / `list_reduce` folds to keep the
  * generated SQL linear in size.
  *
  * Ported algorithms are public domain: XXH64 (Collet; the hash behind
  * Spark's `xxhash64` with seed 42) and SplitMix64 (Steele et al.; the
  * finalizer in [[graft.functions.HashFunctions.mix64]]).
  */
private[graft] object DuckHash {

  private val M = "18446744073709551616" // 2^64

  // XXH64 / SplitMix64 public-domain constants (unsigned decimal form).
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")
  private val Seed = BigInt(42) // Spark's xxhash64 seed
  val Golden = BigInt("11400714819323198485") // 0x9E3779B97F4A7C15
  private val Mix1 = BigInt("13787848793156543929") // 0xBF58476D1CE4E5B9
  private val Mix2 = BigInt("10723151780598845931") // 0x94D049BB133111EB

  private val Mod = BigInt(1) << 64
  private def m(x: BigInt): String = (x.mod(Mod)).toString

  // ---- u64 algebra over SQL strings (values are UBIGINT expressions) ----

  def wadd(a: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT) + CAST($b AS HUGEINT)) % $M AS UBIGINT)"

  /** a*b mod 2^64: split b into 32-bit halves so HUGEINT never overflows. */
  def wmul(a: String, b: String): String =
    s"CAST(((CAST($a AS HUGEINT) * CAST($b % 4294967296 AS HUGEINT)) % $M" +
      s" + ((CAST($a AS HUGEINT) * CAST($b // 4294967296 AS HUGEINT)) % 4294967296) * 4294967296)" +
      s" % $M AS UBIGINT)"

  def wxor(a: String, b: String): String = s"xor(CAST($a AS UBIGINT), CAST($b AS UBIGINT))"

  def shr(x: String, n: Int): String =
    s"(CAST($x AS UBIGINT) // CAST(${m(BigInt(1) << n)} AS UBIGINT))"

  def wrotl(x: String, r: Int): String =
    s"CAST(((CAST($x AS HUGEINT) * ${m(BigInt(1) << r)}) % $M" +
      s" + CAST($x AS UBIGINT) // CAST(${m(BigInt(1) << (64 - r))} AS UBIGINT)) AS UBIGINT)"

  /** u64 → the signed BIGINT Spark produces for the same bit pattern. */
  def signed(u: String): String =
    s"CAST(CASE WHEN CAST($u AS UBIGINT) >= 9223372036854775808 THEN CAST($u AS HUGEINT) - $M" +
      s" ELSE CAST($u AS HUGEINT) END AS BIGINT)"

  // ---- XXH64 steps ----

  private def xxround(acc: String, lane: String): String =
    wmul(wrotl(wadd(acc, wmul(lane, m(P2))), 31), m(P1))

  private def mergeRound(h: String, v: String): String =
    wadd(wmul(wxor(h, xxround("CAST(0 AS UBIGINT)", v)), m(P1)), m(P4))

  /** CTE chain `hx1..hx12` computing `h` = XXH64(seed 42) of `tokCol`'s
    * UTF-8 bytes. Prefix with a CTE named `hx0` carrying `tokCol` (plus any
    * carry-through columns); every `hx*` stage preserves all columns.
    * Bytes are derived from codepoints with an explicit UTF-8 encoder, so
    * non-ASCII text (e.g. CJK) hashes identically to Spark. */
  def xxhash64Ctes(tokCol: String): String = {
    def lanes(i: String) = s"lanes[$i]"
    s"""hx1 AS (SELECT *,
       |  octet_length(encode($tokCol)) AS n,
       |  flatten(list_transform(
       |    list_transform(range(1, length($tokCol) + 1), i -> unicode($tokCol[i])),
       |    c -> CASE
       |      WHEN c < 128 THEN [CAST(c AS UBIGINT)]
       |      WHEN c < 2048 THEN [CAST(192 + c // 64 AS UBIGINT), CAST(128 + c % 64 AS UBIGINT)]
       |      WHEN c < 65536 THEN [CAST(224 + c // 4096 AS UBIGINT), CAST(128 + (c // 64) % 64 AS UBIGINT), CAST(128 + c % 64 AS UBIGINT)]
       |      ELSE [CAST(240 + c // 262144 AS UBIGINT), CAST(128 + (c // 4096) % 64 AS UBIGINT), CAST(128 + (c // 64) % 64 AS UBIGINT), CAST(128 + c % 64 AS UBIGINT)]
       |    END)) AS bytes
       |  FROM hx0),
       |hx2 AS (SELECT *,
       |  list_transform(range(0, n // 8), j ->
       |    bytes[8*j+1] + bytes[8*j+2]*256 + bytes[8*j+3]*65536 + bytes[8*j+4]*16777216
       |    + bytes[8*j+5]*CAST(4294967296 AS UBIGINT) + bytes[8*j+6]*CAST(1099511627776 AS UBIGINT)
       |    + bytes[8*j+7]*CAST(281474976710656 AS UBIGINT) + bytes[8*j+8]*CAST(72057594037927936 AS UBIGINT)) AS lanes
       |  FROM hx1),
       |hx3 AS (SELECT *,
       |  CASE WHEN n >= 32 THEN list_reduce(list_prepend(CAST(${m(Seed + P1 + P2)} AS UBIGINT),
       |    list_transform(range(0, n // 32), si -> ${lanes("4*si+1")})), (acc, x) -> ${xxround("acc", "x")}) END AS v1,
       |  CASE WHEN n >= 32 THEN list_reduce(list_prepend(CAST(${m(Seed + P2)} AS UBIGINT),
       |    list_transform(range(0, n // 32), si -> ${lanes("4*si+2")})), (acc, x) -> ${xxround("acc", "x")}) END AS v2,
       |  CASE WHEN n >= 32 THEN list_reduce(list_prepend(CAST(${m(Seed)} AS UBIGINT),
       |    list_transform(range(0, n // 32), si -> ${lanes("4*si+3")})), (acc, x) -> ${xxround("acc", "x")}) END AS v3,
       |  CASE WHEN n >= 32 THEN list_reduce(list_prepend(CAST(${m(Seed - P1)} AS UBIGINT),
       |    list_transform(range(0, n // 32), si -> ${lanes("4*si+4")})), (acc, x) -> ${xxround("acc", "x")}) END AS v4
       |  FROM hx2),
       |hx4 AS (SELECT *,
       |  CASE WHEN n >= 32 THEN ${wadd(wadd(wadd(wrotl("v1", 1), wrotl("v2", 7)), wrotl("v3", 12)), wrotl("v4", 18))}
       |       ELSE CAST(${m(Seed + P5)} AS UBIGINT) END AS h0
       |  FROM hx3),
       |hx5 AS (SELECT *,
       |  CASE WHEN n >= 32 THEN ${mergeRound(mergeRound(mergeRound(mergeRound("h0", "v1"), "v2"), "v3"), "v4")}
       |       ELSE h0 END AS h1
       |  FROM hx4),
       |hx6 AS (SELECT *, ${wadd("h1", "CAST(n AS UBIGINT)")} AS h2 FROM hx5),
       |hx7 AS (SELECT *,
       |  list_reduce(list_prepend(h2,
       |    list_transform(range((n // 32) * 4, n // 8), j -> ${lanes("j+1")})),
       |    (acc, k) -> ${wadd(wmul(wrotl(wxor("acc", xxround("CAST(0 AS UBIGINT)", "k")), 27), m(P1)), m(P4))}) AS h3
       |  FROM hx6),
       |hx8 AS (SELECT *,
       |  CASE WHEN n % 8 >= 4 THEN ${wadd(wmul(wrotl(wxor("h3", wmul("(bytes[(n//8)*8+1] + bytes[(n//8)*8+2]*256 + bytes[(n//8)*8+3]*65536 + bytes[(n//8)*8+4]*16777216)", m(P1))), 23), m(P2)), m(P3))}
       |       ELSE h3 END AS h4
       |  FROM hx7),
       |hx9 AS (SELECT *,
       |  list_reduce(list_prepend(h4,
       |    list_transform(range((n // 8) * 8 + CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END, n), i -> bytes[i+1])),
       |    (acc, b) -> ${wmul(wrotl(wxor("acc", wmul("b", m(P5))), 11), m(P1))}) AS h5
       |  FROM hx8),
       |hx10 AS (SELECT *, ${wmul(wxor("h5", shr("h5", 33)), m(P2))} AS h6 FROM hx9),
       |hx11 AS (SELECT *, ${wmul(wxor("h6", shr("h6", 29)), m(P3))} AS h7 FROM hx10),
       |hx12 AS (SELECT *, ${wxor("h7", shr("h7", 32))} AS h FROM hx11)""".stripMargin
  }

  // ---- SplitMix64 ----

  /** CTE chain `<p>1..<p>4` computing `mh` = splitmix64 finalizer of column
    * `xCol` (u64). Prefix with a CTE named `<p>0`. The prefix parameter
    * exists because a query can need TWO mix chains (e.g. q109 hashes both
    * the cluster unit and the raw doc id) — or compose with fragments like
    * the LSH banding CTEs that already burn the default `mx` names. */
  def mix64Ctes(xCol: String, p: String = "mx"): String =
    s"""${p}1 AS (SELECT *, ${wadd(xCol, m(Golden))} AS ${p}z0 FROM ${p}0),
       |${p}2 AS (SELECT *, ${wmul(wxor(s"${p}z0", shr(s"${p}z0", 30)), m(Mix1))} AS ${p}z1 FROM ${p}1),
       |${p}3 AS (SELECT *, ${wmul(wxor(s"${p}z1", shr(s"${p}z1", 27)), m(Mix2))} AS ${p}z2 FROM ${p}2),
       |${p}4 AS (SELECT *, ${wxor(s"${p}z2", shr(s"${p}z2", 31))} AS mh FROM ${p}3)""".stripMargin

  /** Inline (non-staged) splitmix64 of a SHORT u64 expression — ~32 textual
    * copies of `x`, so only use where `x` is a column reference or a tiny
    * arithmetic term (e.g. the hyperplane (seed, plane, dim) mix). */
  def mix64Inline(x: String): String = {
    val z0 = wadd(x, m(Golden))
    val z1 = wmul(wxor(z0, shr(z0, 30)), m(Mix1))
    val z2 = wmul(wxor(z1, shr(z1, 27)), m(Mix2))
    wxor(z2, shr(z2, 31))
  }
}
