package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact-decimal dot product / squared L2 over two vector columns as ONE
  * native codegen expression — the oracle-tier scoring kernel.
  *
  * Why a custom Expression (SURVEY.md §7 ladder, tier b): the column form
  * ([[graft.functions.VectorFunctions.dotExact]] /
  * [[graft.functions.VectorFunctions.l2SqExactDec]]) composes
  * `aggregate(zip_with(...))` higher-order functions, which are
  * CodegenFallback — every element pays a boxed lambda call, a BigDecimal
  * allocation per product/difference/add, and an intermediate array per
  * pair. Pair scoring is the compute wall of every exact ANN certificate
  * (corpus × queries pairs × dims), so it gets the [[IvfArgminL2]]
  * treatment: DECIMAL(18,6) quantization as scaled longs, the accumulation
  * as plain long arithmetic, one Decimal constructed per RESULT instead of
  * ~4 per element.
  *
  * EXACT-ARITHMETIC CONTRACT, bit-compatible with the column forms it
  * replaces: each element quantizes to DECIMAL(18,6) — reproduced as
  * `BigDecimal.valueOf(x).setScale(6, HALF_UP)` scaled longs
  * ([[IvfArgminL2.qz6]]), the exact rounding Spark's double→decimal cast
  * performs — and the result is Σ qa·qb (dot) or Σ (qa−qb)² (l2) in 10⁻¹²
  * units, returned as DECIMAL(30,12) built from the exact unscaled long.
  * Scale-6 differences and scale-12 products of scale-6 values are exact
  * in decimal arithmetic, so the long path and the old BigDecimal path
  * compute the identical rational — the DuckDB oracle replays the same
  * math. Overflow contract (the [[IvfArgminL2]] bound): coordinates beyond
  * ~√(2⁶³/dim)/2 scaled units fail LOUDLY (ArithmeticException) instead of
  * wrapping — embeddings are O(1) by the l2SqExact contract, far inside.
  *
  * Nulls: a null vector, a null ELEMENT, or a length mismatch yields null
  * — exactly the `zip_with` padding + null-propagating-arithmetic
  * behaviour of the column form (zip_with pads the shorter side with
  * nulls; one null product poisons the whole aggregate).
  */
case class ExactVecScaled(left: Expression, right: Expression, dot: Boolean)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float|double> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DecimalType(30, 12)
  override def nullable: Boolean = true
  override def prettyName: String = if (dot) "graft_dot_exact" else "graft_l2sq_exact"

  // lazy: child dataTypes are only known post-analysis
  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    ExactVecScaled.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat, dot)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("exactVecRes")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Object $r = graft.plans.ExactVecScaled.compute(
         |  $a, $b, $leftIsFloat, $rightIsFloat, $dot);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.types.Decimal) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExactVecScaled =
    copy(left = newLeft, right = newRight)
}

object ExactVecScaled {

  /** Shared by interpreted eval and generated code. Returns a Decimal(30,12)
    * or null on length mismatch / null element. */
  def compute(
      a: ArrayData,
      b: ArrayData,
      aIsFloat: Boolean,
      bIsFloat: Boolean,
      dot: Boolean): Decimal = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lim = IvfArgminL2.magLimit(math.max(n, 1))
    var sum = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val qa = IvfArgminL2.qz6(if (aIsFloat) a.getFloat(i).toDouble else a.getDouble(i))
      val qb = IvfArgminL2.qz6(if (bIsFloat) b.getFloat(i).toDouble else b.getDouble(i))
      IvfArgminL2.requireMag(qa, lim, n)
      IvfArgminL2.requireMag(qb, lim, n)
      sum += (if (dot) qa * qb else { val d = qa - qb; d * d })
      i += 1
    }
    Decimal(sum, 30, 12)
  }
}
