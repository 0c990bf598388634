package graft.sources

import graft.functions.HashFunctions

/** Deterministic ISTAT-census-shaped CSV fixture (SURVEY.md §2.1 S3;
  * reference notebook cells 9/15) — the GeoJsonFixture move applied to the
  * WIDE CSV format, so the 135-column explicit-schema scan and the
  * wide→long melt run under the driver gate: every cell value derives from
  * table ids by pure integer/mix64 arithmetic, so a SQL oracle rebuilds the
  * full melted table without reading the file.
  *
  * Per id `k` (rows emitted in ASCENDING id order) and measure index `j`
  * (0-based position in [[MilanCsvSource.censusMeasures]] — the gappy
  * 134-code list the reference's 2011 extract carries):
  *   - `PROVINCIA` = printf("PR%03d", k);
  *   - cell = mix64(k·256 + j): EMPTY field when `mix64 & 15 == 15`
  *     (pandas reads int64-with-NaN; our LongType schema reads null — the
  *     branch the melt must carry through), else `(mix64 >>> 16) &
  *     0xFFFFFFFF` (32-bit counts — census magnitudes, no i64 overflow in
  *     downstream sums).
  */
object CensusFixture {

  /** The census CSV text: header + one line per id, 135 fields each. */
  def censusCsv(ids: Seq[Long]): String = {
    val measures = MilanCsvSource.censusMeasures
    val header = ("PROVINCIA" +: measures).mkString(",")
    val lines = ids.sorted.map { id =>
      require(id >= 0, s"censusCsv: negative id $id")
      val cells = measures.indices.map { j =>
        val mh = HashFunctions.mix64Long(id * 256L + j)
        if ((mh & 15L) == 15L) "" else ((mh >>> 16) & 0xffffffffL).toString
      }
      (f"PR$id%03d" +: cells).mkString(",")
    }
    (header +: lines).mkString("", "\n", "\n")
  }
}
