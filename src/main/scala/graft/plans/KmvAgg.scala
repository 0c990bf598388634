package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bottom-k-by-hash keeper — the buffer behind the KMV quantile registers
  * ([[graft.operators.Sketches.kmvRegisters]]).
  *
  * Per group, keeps the k input pairs with the SMALLEST `h` (a signed-long
  * hash; ties — only possible for duplicate row ids — break by `v` then
  * drop as exact duplicates), each carrying its payload `v`. Because the
  * kept set is a pure function of the input SET, the result is independent
  * of partition layout and merge order, and bottom-k is losslessly
  * mergeable: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
  * property that makes persisted per-shard registers recombinable into any
  * later slice without touching the data again.
  *
  * Same mechanism as [[TopKAgg]] (bounded buffer inside a
  * `TypedImperativeAggregate`, ObjectHashAggregate runs it with map-side
  * partial combine) with the comparison on a LONG key and a payload
  * column carried through — kept separate because fusing the two into one
  * generic aggregate would push the comparator through boxed generics in
  * the per-row `offer` hot path.
  *
  * Output: `array<struct<h:bigint, v:double>>` sorted by `h` ascending.
  */
case class KmvAgg(
    left: Expression, // h: bigint (signed SplitMix64 hash of the row id)
    right: Expression, // v: double (the measured value)
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvAgg.Buffer]
    with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_kmv requires (bigint, double) input, got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = KmvAgg.resultType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): KmvAgg.Buffer = new KmvAgg.Buffer(k)

  override def update(buf: KmvAgg.Buffer, input: InternalRow): KmvAgg.Buffer = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      buf.offer(h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KmvAgg.Buffer, other: KmvAgg.Buffer): KmvAgg.Buffer = {
    buf.absorb(other); buf
  }

  override def eval(buf: KmvAgg.Buffer): Any =
    new GenericArrayData(buf.ascending.map { case (h, v) => InternalRow(h, v) })

  override def serialize(buf: KmvAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val es = buf.elements
    out.writeInt(es.length)
    es.foreach { case (h, v) => out.writeLong(h); out.writeDouble(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvAgg.Buffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new KmvAgg.Buffer(k)
    var n = in.readInt()
    while (n > 0) { buf.offer(in.readLong(), in.readDouble()); n -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvAgg =
    copy(left = newLeft, right = newRight)
}

object KmvAgg {

  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false))),
    containsNull = false)

  /** `(h1,v1)` ranks before `(h2,v2)`: smaller hash; hash ties (duplicate
    * row ids) by smaller value. Fully equal pairs have no defined order —
    * the buffer keeps bottom-k of the input MULTISET, so each copy
    * counts, which is itself partition- and merge-order-independent. */
  private def before(h1: Long, v1: Double, h2: Long, v2: Double): Boolean = {
    val c = java.lang.Long.compare(h1, h2)
    c < 0 || (c == 0 && java.lang.Double.compare(v1, v2) < 0)
  }

  /** Bounded bottom-k keeper: a MAX-heap of size ≤ k whose root is the
    * LARGEST kept hash, so a full-buffer `offer` is one root comparison
    * (reject) or an O(log k) sift (replace). Flat primitive arrays. */
  final class Buffer(k: Int) {
    private val hs = new Array[Long](k)
    private val vs = new Array[Double](k)
    private var n = 0

    private def after(a: Int, b: Int): Boolean =
      !before(hs(a), vs(a), hs(b), vs(b)) && (hs(a) != hs(b) || vs(a) != vs(b))

    private def swap(a: Int, b: Int): Unit = {
      val th = hs(a); hs(a) = hs(b); hs(b) = th
      val tv = vs(a); vs(a) = vs(b); vs(b) = tv
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && after(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }

    private def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < n && after(l, w)) w = l
        if (r < n && after(r, w)) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }

    def offer(h: Long, v: Double): Unit =
      if (n < k) {
        hs(n) = h; vs(n) = v; n += 1; siftUp(n - 1)
      } else if (before(h, v, hs(0), vs(0))) {
        hs(0) = h; vs(0) = v; siftDown()
      }

    def absorb(other: Buffer): Unit = {
      var j = 0
      while (j < other.n) { offer(other.hs(j), other.vs(j)); j += 1 }
    }

    def elements: Array[(Long, Double)] =
      Array.tabulate(n)(j => (hs(j), vs(j)))

    /** Kept pairs by hash ascending (the register order). */
    def ascending: Array[(Long, Double)] =
      elements.sortWith { case ((h1, v1), (h2, v2)) => before(h1, v1, h2, v2) }
  }
}
