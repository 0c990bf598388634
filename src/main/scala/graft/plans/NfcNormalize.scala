package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Web-crawl text arrives in mixed normalization forms: the same visible
  * string can be composed ("é" U+00E9) or decomposed ("e"+U+0301), which
  * breaks exact dedup, shingle hashing, and vocabulary counting — two
  * canonically-equal documents hash differently. Normalizing to NFC before
  * any hash-based operator (Dedup/TfIdf/vocab) makes canonical equality and
  * byte equality coincide.
  *
  * Why an Expression and not a UDF (SURVEY.md §7 ladder, tier b): this runs
  * once per document on the 100 TB text column — a Scala UDF would box every
  * row and fence off whole-stage codegen for the entire downstream cleaning
  * chain. The codegen path calls `java.text.Normalizer` (ICU-equivalent NFC
  * from the JDK, stable across JVM vendors per Unicode TR15) with a
  * fast-path: `Normalizer.isNormalized` is O(n) with no allocation and NFC
  * input is the overwhelmingly common case, so most rows pay one scan and
  * zero copies.
  *
  * Null propagates; the empty string is NFC by definition.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_nfc requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
