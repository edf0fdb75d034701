package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded k-element buffer for top-k aggregation: a binary MAX-heap on
  * the lexicographic key (ns, vid) that keeps the k SMALLEST keys seen.
  * Insert is O(log k) and — crucially — memory is O(k) regardless of
  * group size, unlike `collect_list` whose agg buffer holds the whole
  * group before a sort/slice can bound it. At 10⁹ corpus rows per query
  * group that is the difference between a 10-element buffer and a
  * multi-GB one.
  *
  * Key order matches Spark's `array_sort` over `struct<ns double, vid
  * bigint>`: `java.lang.Double.compare` on ns (NaN greatest, -0.0 <
  * 0.0 — identical to Catalyst's double ordering), then vid ascending.
  */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  val ns: Array[Double] = new Array[Double](k)
  val vid: Array[Long] = new Array[Long](k)

  @inline private def lt(n1: Double, v1: Long, n2: Double, v2: Long): Boolean = {
    val c = java.lang.Double.compare(n1, n2)
    c < 0 || (c == 0 && v1 < v2)
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (lt(ns(p), vid(p), ns(i), vid(i))) { // parent smaller ⇒ swap up (max-heap)
        val tn = ns(p); ns(p) = ns(i); ns(i) = tn
        val tv = vid(p); vid(p) = vid(i); vid(i) = tv
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && lt(ns(m), vid(m), ns(l), vid(l))) m = l
      if (r < size && lt(ns(m), vid(m), ns(r), vid(r))) m = r
      if (m == i) return
      val tn = ns(m); ns(m) = ns(i); ns(i) = tn
      val tv = vid(m); vid(m) = vid(i); vid(i) = tv
      i = m
    }
  }

  def insert(n: Double, v: Long): Unit = {
    if (size < k) {
      ns(size) = n; vid(size) = v; size += 1
      siftUp(size - 1)
    } else if (lt(n, v, ns(0), vid(0))) { // beats the current worst
      ns(0) = n; vid(0) = v
      siftDown()
    }
  }

  def merge(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.size) { insert(o.ns(i), o.vid(i)); i += 1 }
  }

  /** Heap contents as (ns, vid) pairs sorted ascending — the same array
    * `slice(array_sort(collect_list(struct(ns, vid))), 1, k)` yields. */
  def sortedRows(): Array[Any] = {
    val idx = Array.range(0, size).sortWith((a, b) => lt(ns(a), vid(a), ns(b), vid(b)))
    idx.map(i => new GenericInternalRow(Array[Any](ns(i), vid(i))): Any)
  }
}

/** bounded_top_k(ns: double, vid: bigint) → array<struct<ns, vid>>,
  * the k lexicographically-smallest (ns, vid) pairs sorted ascending.
  *
  * A `TypedImperativeAggregate` so Spark runs it with map-side partial
  * aggregation (ObjectHashAggregate): each map task keeps one k-heap
  * per group, the shuffle carries ≤ tasks·k serialized pairs per group,
  * and the final merge is a heap-merge. Null ns/vid inputs are skipped
  * (they cannot rank). This replaces the unbounded
  * `collect_list`+`array_sort`+`slice` top-k flagged in the round-4
  * verdict as the one remaining scale-killer in the ANN path.
  */
final case class BoundedTopKAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"bad k=$k")

  override def prettyName: String = "graft_bounded_top_k"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ns", DoubleType, nullable = false),
      StructField("vid", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (double, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val n = left.eval(input)
    val v = right.eval(input)
    if (n != null && v != null)
      buf.insert(n.asInstanceOf[Double], v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedRows())

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.ns(i)).putLong(buf.vid(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.ns(i) = bb.getDouble(); buf.vid(i) = bb.getLong(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopKAgg =
    copy(left = newLeft, right = newRight)
}

/** Bounded buffer of the k smallest DISTINCT long values, kept sorted
  * ascending — the KMV (k-minimum-values) sketch proper. Where
  * [[TopKBuffer]] ranks (ns, vid) PAIRS and admits duplicates, a KMV
  * estimator is only correct over distinct hash values, so this buffer
  * dedups on insert: a value already present is a no-op. Insert is a
  * binary search + shift (O(log k) + O(k) moves; k is a dial ≤ 2^20 and
  * in practice ≤ a few hundred), memory O(k) regardless of stream
  * length, and merge (insert each) is associative, commutative and
  * idempotent — which is what lets the sketch BE streaming aggregation
  * state (s27) and shuffle as map-side partials (ObjectHashAggregate).
  */
final class MinKDistinctBuffer(val k: Int) {
  var size: Int = 0
  val v: Array[Long] = new Array[Long](k)

  def insert(x: Long): Unit = {
    // binary search for the insertion point; bail on an exact hit
    var lo = 0; var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v(mid) == x) return
      else if (v(mid) < x) lo = mid + 1
      else hi = mid
    }
    if (lo >= k) return // larger than the current k-th smallest
    val last = if (size < k) size else k - 1
    var i = last
    while (i > lo) { v(i) = v(i - 1); i -= 1 }
    v(lo) = x
    if (size < k) size += 1
  }

  def merge(o: MinKDistinctBuffer): Unit = {
    var i = 0
    while (i < o.size) { insert(o.v(i)); i += 1 }
  }
}

/** graft_min_k_distinct(v: bigint) → array<bigint>, the k smallest
  * distinct values sorted ascending — the mergeable KMV bottom-k
  * sketch as a native aggregate. Batch engines reach the same set via
  * `distinct()` + bounded top-k (d46/d61); over a STREAM that distinct
  * would itself need unbounded state, so the dedup must live inside
  * the aggregation buffer — this operator is the O(k)-state honest
  * floor for a streamed KMV (s27). Null inputs are skipped.
  */
final case class MinKDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKDistinctBuffer]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"bad k=$k")

  override def prettyName: String = "graft_min_k_distinct"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs bigint, got ${child.dataType.sql}")

  override def createAggregationBuffer(): MinKDistinctBuffer =
    new MinKDistinctBuffer(k)

  override def update(buf: MinKDistinctBuffer, input: InternalRow): MinKDistinctBuffer = {
    val x = child.eval(input)
    if (x != null) buf.insert(x.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MinKDistinctBuffer, other: MinKDistinctBuffer): MinKDistinctBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: MinKDistinctBuffer): Any =
    new GenericArrayData(buf.v.take(buf.size))

  override def serialize(buf: MinKDistinctBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.v(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKDistinctBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MinKDistinctBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.v(i) = bb.getLong(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKDistinctAgg =
    copy(child = newChild)
}
