package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, fingerprinting, quality scoring, language id.
  *
  * All built-in-function compositions (no UDFs): each is a per-row codegen'd
  * expression with no shuffle, so they map over 100 TB of documents at scan
  * speed.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. Empty text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Character count excluding all whitespace. */
  def charCountNoSpace(text: Column): Column =
    length(regexp_replace(text, "\\s", ""))

  /** Canonical text normalization for fingerprinting: lowercase, collapse
    * whitespace runs to single spaces, trim. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Deterministic 128-bit content fingerprint of normalized text (md5 hex —
    * cross-engine portable). */
  def fingerprintMd5(text: Column): Column =
    md5(normalize(text).cast("binary"))

  /** Rolling 64-bit polynomial fingerprint over normalized tokens:
    * h = fold(h * B + tokenHash) with wrapping long arithmetic. Unlike md5
    * this composes incrementally, the shape used for content-defined
    * chunking. Codegen'd aggregate over the token array. */
  def rollingHash64(text: Column): Column =
    aggregate(
      tokens(normalize(text)),
      lit(1125899906842597L),
      (acc, t) => acc * lit(31L) + HashFunctions.tokenHash(t)
    )

  /** Word k-shingles as space-joined strings; documents shorter than k
    * tokens yield no shingles. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))
        )
      )
  }

  /** Distinct word k-shingles (set semantics, for Jaccard). */
  def distinctShingles(text: Column, k: Int): Column =
    array_distinct(wordShingles(text, k))

  // --- Quality scoring (length / punctuation / stopword heuristics) -------

  val StopWords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "from"
  )

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  def stopwordCount(text: Column): Column =
    size(filter(tokens(lower(text)), t => t.isin(StopWords: _*)))

  /** Ratio helpers guard n=0 to stay null-free. */
  private def ratio(num: Column, den: Column): Column =
    when(den === 0, lit(0.0)).otherwise(num.cast("double") / den.cast("double"))

  def punctRatio(text: Column): Column = ratio(punctCount(text), length(text))

  def stopwordRatio(text: Column): Column =
    ratio(stopwordCount(text), tokenCount(text))

  def meanTokenLength(text: Column): Column =
    ratio(charCountNoSpace(text), tokenCount(text))

  /** Composite document quality score in [0,1]: rewards stopword presence
    * (natural prose), moderate token length, and some punctuation — the
    * standard cheap pre-filter shape for web-scale corpus cleaning. Fixed
    * double operation order → bit-deterministic. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(64.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    val punctScore = least(punctRatio(text) * lit(20.0), lit(1.0))
    lenScore * lit(0.4) + stopScore * lit(0.4) + punctScore * lit(0.2)
  }

  // --- Language identification (marker-token heuristic) -------------------

  /** Marker stopwords per language; the n-gram-free heuristic: count marker
    * hits per language over the token stream, argmax with a fixed
    * tie-break order (en < de < es < fr < zh). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "de"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "des", "une"),
    "zh" -> Seq.empty // handled by CJK codepoint detection below
  )

  def markerCount(text: Column, markers: Seq[String]): Column =
    if (markers.isEmpty) lit(0)
    else size(filter(tokens(lower(text)), t => t.isin(markers: _*)))

  def cjkCharCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", ""))

  /** Predicted language code. CJK characters dominate; otherwise the marker
    * counts vote with deterministic tie-breaking (first language in
    * [[LangMarkers]] order wins ties, 'und' when no markers hit). */
  def langId(text: Column): Column = {
    val counts = LangMarkers.collect {
      case (lang, markers) if markers.nonEmpty => lang -> markerCount(text, markers)
    }
    val best = counts.foldLeft((lit("und"), lit(0))) {
      case ((bl, bc), (lang, c)) =>
        (when(c > bc, lit(lang)).otherwise(bl), when(c > bc, c).otherwise(bc))
    }
    when(cjkCharCount(text) * 2 > length(text), lit("zh")).otherwise(best._1)
  }
}
