package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}

/** The HLL register table (256 buckets over the 40-bit rho domain) as
  * a mergeable 256-BYTE aggregation buffer — the d49/s18 sketch with
  * the per-gram-occurrence explode folded away.
  *
  * The row form (`TextQueries.hllRegisters`) explodes every gram
  * occurrence into a (source, gram) row, md5-hashes it, and two-level
  * hash-aggregates millions of rows down to ≤ sources·256 registers.
  * This aggregate walks each document's L-token windows in one update
  * call — the `gramHashes` byte-buffer walk, md5 instead of xxhash64 —
  * and folds registers in place, so the engine never materializes a
  * gram row, a shingle array, or a per-doc distinct: max over a
  * multiset equals max over its set, the same invariant the streaming
  * leg already stood on. The hash is the oracle-shared md5 coin
  * (first 12 hex digits = top 48 digest bits, exactly
  * `graft_md5_prefix(gram, 12)`), so the emitted (bucket, r) rows are
  * bit-identical to the row form's and every d49/s18 oracle still
  * gates them. Merge is a bucket-wise byte max — associative,
  * commutative, idempotent — which is what lets the buffer BE
  * streaming aggregation state (s18: ONE row per source where the row
  * form kept 256).
  *
  * rho is INTEGER math, matching the SQL rendering bit-for-bit:
  * bucket = h >> 40, w = h & (2^40−1), r = 41 − bitlength(w) with
  * w = 0 ⇒ 41; r ∈ [1, 41], so register 0 means "bucket never seen"
  * and eval emits only occupied buckets (the row form's groupBy also
  * only yields observed groups).
  */
final class HllRegBuffer {
  val regs: Array[Byte] = new Array[Byte](256)

  def insertHash(h: Long): Unit = {
    val b = (h >>> 40).toInt
    val w = h & 0xFFFFFFFFFFL
    val r = if (w == 0L) 41
      else 41 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (r > regs(b)) regs(b) = r.toByte
  }

  def merge(o: HllRegBuffer): Unit = {
    var i = 0
    while (i < 256) { if (o.regs(i) > regs(i)) regs(i) = o.regs(i); i += 1 }
  }
}

object HllRegKernels {
  /** Fold one document's L-token-window grams into the register
    * buffer: the gramHashes walk (tokens joined by ' ' in a reusable
    * byte buffer) with the md5-prefix coin. Documents with fewer than
    * l tokens contribute nothing, like the explode form. */
  def insertGrams(toks: ArrayData, l: Int, regs: HllRegBuffer): Unit = {
    val numToks = toks.numElements()
    if (numToks < l) return
    var buf = new Array[Byte](256)
    var i = 0
    while (i <= numToks - l) {
      var len = 0
      var j = 0
      while (j < l) {
        val s = toks.getUTF8String(i + j)
        val nb = s.numBytes
        if (len + nb + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + nb + 1))
        s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
        len += nb
        if (j < l - 1) { buf(len) = ' '; len += 1 }
        j += 1
      }
      regs.insertHash(HashKernels2.md5PrefixRange(buf, len, 12))
      i += 1
    }
  }
}

/** graft_hll_regs(toks: array<string>, l) →
  * array<struct<bucket: bigint, r: int>> of the OCCUPIED registers,
  * bucket-ascending (see [[HllRegBuffer]]). */
final case class HllRegsAgg(
    child: Expression,
    l: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllRegBuffer]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(l > 0 && l <= 1024, s"bad l=$l")

  override def prettyName: String = "graft_hll_regs"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("r", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, ArrayType(StringType),
        ignoreNullability = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${child.dataType.sql}")

  override def createAggregationBuffer(): HllRegBuffer = new HllRegBuffer

  override def update(buf: HllRegBuffer, input: InternalRow): HllRegBuffer = {
    val toks = child.eval(input)
    if (toks != null)
      HllRegKernels.insertGrams(toks.asInstanceOf[ArrayData], l, buf)
    buf
  }

  override def merge(buf: HllRegBuffer, other: HllRegBuffer): HllRegBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: HllRegBuffer): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var b = 0
    while (b < 256) {
      if (buf.regs(b) > 0)
        out += new GenericInternalRow(Array[Any](b.toLong, buf.regs(b).toInt))
      b += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: HllRegBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(256)
    bb.put(buf.regs)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HllRegBuffer = {
    val buf = new HllRegBuffer
    System.arraycopy(bytes, 0, buf.regs, 0, 256)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegsAgg =
    copy(child = newChild)
}
