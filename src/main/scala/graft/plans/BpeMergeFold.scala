package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply a BPE merge table to a symbol array — each merge (lhs, rhs), in
  * rank order, replaces adjacent (lhs, rhs) symbol pairs greedily
  * left-to-right without overlap ("aaa" under (a,a) → "aa a") — as a
  * native codegen expression.
  *
  * Why a custom Expression (SURVEY.md §7 preference ladder, tier b): the
  * `aggregate()` higher-order-function fold this replaces is (a)
  * CodegenFallback — the whole projection drops out of whole-stage codegen
  * — and (b) accidentally QUADRATIC per word per merge: its accumulator
  * concatenates a fresh output array per element. Chained once per merge
  * (the encode path applies every merge), that interpreted O(Σ len²) fold
  * measured 19 s on the sf1 vocabulary; this kernel is one in-place linear
  * walk per merge, inside codegen, and applies the WHOLE table in one
  * projection — so a 32k-merge production table is one expression, not
  * 32k nested plan nodes.
  *
  * Semantics are byte-identical to the sequential fold: merges apply in
  * the given order, each as a full greedy non-overlapping left-to-right
  * pass over the PREVIOUS pass's output. Null elements never match and
  * copy through (the char-split producer never emits them); a null ARRAY
  * yields null.
  */
case class BpeMergeFold(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.nonEmpty, "BpeMergeFold: empty merge table")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_bpe_merge_fold requires array<string>, got ${t.sql}")
    }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "graft_bpe_merge_fold"

  // (lhs, rhs, lhs+rhs) as UTF8String triples, shipped once per task via
  // reference objects (codegen) / captured here (interpreted).
  @transient private lazy val lhsArr: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val rhsArr: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._2)).toArray
  @transient private lazy val outArr: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1 + m._2)).toArray

  /** The shared kernel: in-place greedy fold of every merge over a working
    * buffer (output never outgrows input, so write ptr ≤ read ptr). */
  private def fold(
      buf: Array[UTF8String],
      n0: Int,
      ls: Array[UTF8String],
      rs: Array[UTF8String],
      os: Array[UTF8String]): Int = {
    var len = n0
    var m = 0
    while (m < ls.length) {
      val lh = ls(m); val rh = rs(m); val mg = os(m)
      var w = 0
      var i = 0
      while (i < len) {
        if (i + 1 < len && buf(i) != null && buf(i + 1) != null &&
            buf(i).equals(lh) && buf(i + 1).equals(rh)) {
          buf(w) = mg; w += 1; i += 2
        } else {
          buf(w) = buf(i); w += 1; i += 1
        }
      }
      len = w
      m += 1
    }
    len
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      buf(i) = if (a.isNullAt(i)) null else a.getUTF8String(i)
      i += 1
    }
    val len = fold(buf, n, lhsArr, rhsArr, outArr)
    new GenericArrayData(java.util.Arrays.copyOf(buf, len).asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = "org.apache.spark.unsafe.types.UTF8String"
    val ls = ctx.addReferenceObj("bpeLhs", lhsArr, s"$u[]")
    val rs = ctx.addReferenceObj("bpeRhs", rhsArr, s"$u[]")
    val os = ctx.addReferenceObj("bpeOut", outArr, s"$u[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val buf = ctx.freshName("buf")
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      val lh = ctx.freshName("lh")
      val rh = ctx.freshName("rh")
      val mg = ctx.freshName("mg")
      s"""
         |int $n = $a.numElements();
         |$u[] $buf = new $u[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $buf[$i] = $a.isNullAt($i) ? null : $a.getUTF8String($i);
         |}
         |int $len = $n;
         |for (int $m = 0; $m < $ls.length; $m++) {
         |  $u $lh = $ls[$m]; $u $rh = $rs[$m]; $u $mg = $os[$m];
         |  int $w = 0;
         |  for (int $i = 0; $i < $len; ) {
         |    if ($i + 1 < $len && $buf[$i] != null && $buf[$i + 1] != null &&
         |        $buf[$i].equals($lh) && $buf[$i + 1].equals($rh)) {
         |      $buf[$w++] = $mg; $i += 2;
         |    } else {
         |      $buf[$w++] = $buf[$i]; $i += 1;
         |    }
         |  }
         |  $len = $w;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) java.util.Arrays.copyOf($buf, $len));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeFold =
    copy(child = newChild)
}
