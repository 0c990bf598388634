package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k as a real AGGREGATE, not a window.
  *
  * The idiomatic Spark top-k-per-group (`row_number().over(partitionBy(g)
  * .orderBy(v.desc)) <= k`, catalog q14) is partly rescued by Spark 3.5+'s
  * `InferWindowGroupLimit`: a Partial `WindowGroupLimitExec` below the
  * exchange caps the shuffle at groups × k per map partition — the same
  * exchange bound this aggregate achieves. What the window idiom still
  * pays that this aggregate does not: a full O(n log n) SORT of every
  * input row per map partition (WindowGroupLimit consumes sorted input;
  * the reduce side then sorts again), where the k-heap does O(n log k)
  * updates inside a hash aggregate with no sort at all; and a window can
  * only rank — this runs in the same `groupBy.agg(...)` pass as other
  * aggregates and inside Structured Streaming's stateful aggregation
  * (`StreamingLeaders`), neither of which a window-limit plan can do.
  *
  * Semantics: per group, the k largest `(ord, id)` pairs by
  * (ord DESC, id ASC) — the exact order q14's window uses — returned as
  * `array<struct<ord:double, id:bigint>>` in rank order, ready for
  * `posexplode`. Deterministic for distinct ids regardless of partition
  * layout or merge order (the comparator is a total order). Null `ord` or
  * `id` rows are skipped, matching `row_number` over a NULLS LAST window
  * at k ≪ group size.
  *
  * SURVEY.md §7 ladder tier (b): Spark has no bounded top-k aggregate —
  * `max_by` keeps 1, `collect_list`+`slice` buffers the whole group. A
  * `TypedImperativeAggregate` is the same mechanism Spark's own
  * `percentile` and `collect_set` use, minus their unbounded buffers.
  */
case class TopKAgg(
    left: Expression, // ord: double
    right: Expression, // id: bigint
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Buffer]
    with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_topk requires (double, bigint) input, got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = TopKAgg.resultType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKAgg.Buffer =
    new TopKAgg.Buffer(k)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val o = left.eval(input)
    val i = right.eval(input)
    if (o != null && i != null)
      buf.offer(o.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    buf.absorb(other); buf
  }

  override def eval(buf: TopKAgg.Buffer): Any = {
    val ranked = buf.ranked // best-first
    new GenericArrayData(ranked.map { case (o, i) =>
      InternalRow(o, i)
    })
  }

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val es = buf.elements
    out.writeInt(es.length)
    es.foreach { case (o, i) => out.writeDouble(o); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKAgg.Buffer(k)
    var n = in.readInt()
    while (n > 0) { buf.offer(in.readDouble(), in.readLong()); n -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}

object TopKAgg {

  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  /** "Greater" = ranks earlier: larger ord, ties to the SMALLER id. */
  private def better(o1: Double, i1: Long, o2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(o1, o2)
    c > 0 || (c == 0 && i1 < i2)
  }

  /** Bounded top-k keeper: a binary MIN-heap of size ≤ k whose root is the
    * WORST kept element, so each `offer` against a full buffer is one
    * root comparison (reject) or an O(log k) sift (replace). Flat primitive
    * arrays — no boxing, and `serialize` walks them directly. */
  final class Buffer(k: Int) {
    private val ords = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    // heap order: parent is WORSE than (ranks after) both children
    private def worse(a: Int, b: Int): Boolean =
      !better(ords(a), ids(a), ords(b), ids(b)) &&
        (ords(a) != ords(b) || ids(a) != ids(b))

    private def swap(a: Int, b: Int): Unit = {
      val to = ords(a); ords(a) = ords(b); ords(b) = to
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && worse(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }

    private def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i // worst of the triple
        if (l < n && worse(l, w)) w = l
        if (r < n && worse(r, w)) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }

    def offer(o: Double, i: Long): Unit =
      if (n < k) {
        ords(n) = o; ids(n) = i; n += 1; siftUp(n - 1)
      } else if (better(o, i, ords(0), ids(0))) {
        ords(0) = o; ids(0) = i; siftDown()
      }

    def absorb(other: Buffer): Unit = {
      var j = 0
      while (j < other.n) { offer(other.ords(j), other.ids(j)); j += 1 }
    }

    def elements: Array[(Double, Long)] =
      Array.tabulate(n)(j => (ords(j), ids(j)))

    /** Kept elements best-first (rank order). */
    def ranked: Array[(Double, Long)] =
      elements.sortWith { case ((o1, i1), (o2, i2)) => better(o1, i1, o2, i2) }
  }
}
