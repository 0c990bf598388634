package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoding as a native Catalyst expression —
  * the entity tier of [[graft.functions.TextFunctions.htmlToText]].
  *
  * ONE left-to-right pass decodes, at each `&`:
  *
  *   - the common named entities `amp lt gt quot apos nbsp`
  *     (`nbsp` becomes a PLAIN space so it participates in the
  *     extractor's downstream whitespace collapse);
  *   - numeric character references, decimal `&#8217;` and hex
  *     `&#x2019;`/`&#X2019;` — real web HTML hits these on page one.
  *     Valid scalar values only (1..U+10FFFF excluding the surrogate
  *     block); U+00A0 maps to a plain space, the `nbsp` convention.
  *
  * Anything that does not parse — unknown names (`&foo;`), bare `&`,
  * out-of-range or malformed numerics — is copied through literally,
  * never dropped: a regex-tier extractor must degrade to identity, not
  * eat text.
  *
  * Single-decode discipline falls out of the single pass for free:
  * `&amp;lt;` matches `&amp;` first, emits `&`, and resumes AFTER the
  * `;` — the remaining `lt;` is literal text, so the output is the four
  * characters `&lt;`, never `<`. The previous regexp_replace CHAIN had
  * to order `&amp;` last to get the same property and still ran 7 full
  * regex passes over every document; this is one scan.
  *
  * Why an Expression and not a UDF (SURVEY.md §7 ladder, tier b): this
  * runs once per document on the 100 TB text column; the codegen path is
  * a static-method call, so the extraction chain stays inside
  * whole-stage codegen. Fast path: a document with no `&` returns the
  * input UTF8String unchanged, zero allocation.
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_html_unescape requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "graft_html_unescape"

  override def nullSafeEval(input: Any): Any =
    HtmlEntityDecode.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HtmlEntityDecode.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlEntityDecode =
    copy(child = newChild)
}

object HtmlEntityDecode {

  /** Longest reference body we accept between `&` and `;`: `#1114111`
    * (decimal U+10FFFF) and `#x10FFFF` are both 8 chars; names max 4. */
  private val MaxBody = 8

  /** Shared by interpreted eval and generated code. */
  def decode(u: UTF8String): UTF8String = {
    val s = u.toString
    var i = s.indexOf('&')
    if (i < 0) return u
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    sb.append(s, 0, i)
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        var next = -1
        if (semi > i + 1 && semi - (i + 1) <= MaxBody) {
          val body = s.substring(i + 1, semi)
          if (body.charAt(0) == '#') {
            val cp = parseNumeric(body)
            if (cp >= 0) {
              // U+00A0 → plain space: the nbsp convention (must join the
              // extractor's whitespace collapse like the named form does)
              sb.appendCodePoint(if (cp == 0xA0) 0x20 else cp)
              next = semi + 1
            }
          } else {
            val rep = body match {
              case "amp"  => "&"
              case "lt"   => "<"
              case "gt"   => ">"
              case "quot" => "\""
              case "apos" => "'"
              case "nbsp" => " "
              case _      => null
            }
            if (rep != null) { sb.append(rep); next = semi + 1 }
          }
        }
        if (next < 0) { sb.append('&'); i += 1 } else i = next
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Codepoint of a numeric reference body (`#8217`, `#x2019`, `#X2019`),
    * or -1 if malformed, zero, beyond U+10FFFF, or a surrogate. */
  private def parseNumeric(body: String): Int = {
    val hex = body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X')
    val digits = body.substring(if (hex) 2 else 1)
    if (digits.isEmpty) return -1
    var cp = 0
    var j = 0
    while (j < digits.length) {
      val d = Character.digit(digits.charAt(j), if (hex) 16 else 10)
      if (d < 0) return -1
      cp = cp * (if (hex) 16 else 10) + d
      if (cp > 0x10FFFF) return -1
      j += 1
    }
    if (cp == 0 || (cp >= 0xD800 && cp <= 0xDFFF)) -1 else cp
  }
}
