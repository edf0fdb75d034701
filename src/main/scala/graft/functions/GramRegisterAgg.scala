package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact decimal snapping at scale 15, replicating Spark's
  * `cast(double AS DECIMAL(30,15))` — HALF_UP rounding of the
  * SHORTEST-decimal rendering (`Double.toString`) at 15 fractional
  * digits — without the String→BigDecimal detour in the common range.
  * The PCA Gram discipline (v32/v33/s41) is "snap each per-row product
  * to DECIMAL(30,15) BEFORE summing"; this helper is what makes a
  * register-buffer aggregate bit-identical to the SQL cast+sum form.
  * Pinned against the BigDecimal reference by a scalacheck property in
  * GramRegisterSpec.
  */
private[graft] object DecimalSnap {
  private val pow10: Array[Long] = {
    val a = new Array[Long](19)
    a(0) = 1L
    var i = 1
    while (i < 19) { a(i) = a(i - 1) * 10L; i += 1 }
    a
  }

  /** Values the fast long path handles: |d| ≤ 1e3 keeps the unscaled
    * scale-15 value ≤ 1e18, leaving headroom for long accumulation. */
  final val FastAbsMax = 1e3

  private final val P5_15 = 30517578125L // 5^15 ≈ 2^34.83

  /** Integer fast path (r21): the snap contract is HALF_UP at 15
    * fractional digits of the SHORTEST-decimal rendering R of d (what
    * `Double.toString` prints — the dominant cost of the register fold
    * on pre-Ryu JDKs like this 17). R is only known to lie within the
    * read-back interval [d − ulp/2, d + ulp/2], but HALF_UP is CONSTANT
    * between consecutive half-points, so whenever that whole interval
    * sits strictly inside one constancy interval the snap of R equals
    * the snap of the EXACT value of d — computable in pure 128-bit
    * integer math. With d = ±m·2^e (m ≤ 2^53) and t = −(e+15):
    * d·10^15 = m·5^15 / 2^t, so in U = 2·m·5^15 units the half-points
    * are the odd multiples of 2^t and the read-back interval is
    * U ± 5^15 exactly (scale-free: ulp/2·10^15·2^t = 5^15/2). If
    * [U − 5^15, U + 5^15] contains NO multiple of 2^t (conservative:
    * parity ignored), every value in it — R included — snaps to
    * floor((U + 2^t) / 2^(t+1)), no tie possible. Otherwise return
    * `AmbiguousSnap` and the caller takes the toString path. Ambiguity
    * odds are ~2^(35.8−t), i.e. ~2^-7 at |d| ≈ 0.01 and ~1 for
    * |d| ≳ 4 — the Gram products of unit-normalized embeddings live
    * far below that. Bit-equivalence to the reference is pinned in
    * GramRegisterSpec (dense-near-half-boundary + random sweeps).
    */
  final val AmbiguousSnap = Long.MinValue

  def snapFast15(d: Double): Long = {
    val bits = java.lang.Double.doubleToRawLongBits(d)
    val biased = ((bits >>> 52) & 0x7ff).toInt
    var m = bits & 0xfffffffffffffL
    var e = -1074
    if (biased != 0) { m |= (1L << 52); e = biased - 1075 }
    if (m == 0L) return 0L
    val t = -(e + 15) // |d| ≤ 1e3 ⇒ e ≤ −42 ⇒ t ≥ 27
    // U = 2·m·5^15, a 89-bit value as (hi, lo) unsigned
    val tLo = m * P5_15
    val tHi = Math.multiplyHigh(m, P5_15)
    val uLo = tLo << 1
    val uHi = (tHi << 1) | (tLo >>> 63)
    if (t >= 127) {
      // S < 2^-37: the interval tops out far below the first half-point
      return 0L
    }
    // lower/upper = U ∓ 5^15 (U ≥ 2·5^15 when m ≥ 1... m·2 ≥ 2 ⇒ U ≥ 2·5^15,
    // so the subtraction cannot go negative)
    val loLo = uLo - P5_15
    val loHi = uHi - (if (java.lang.Long.compareUnsigned(uLo, P5_15) < 0) 1L else 0L)
    val hiLo = uLo + P5_15
    val hiHi = uHi + (if (java.lang.Long.compareUnsigned(hiLo, uLo) < 0) 1L else 0L)
    // q = x >> t for the 128-bit endpoints
    def shr(hi: Long, lo: Long, s: Int): Long =
      if (s >= 64) hi >>> (s - 64)
      else if (s == 0) lo
      else (lo >>> s) | (hi << (64 - s))
    val qLo = shr(loHi, loLo, t)
    val qHi = shr(hiHi, hiLo, t)
    // remainder of the lower endpoint (nonzero ⇒ strictly inside)
    val remNonzero =
      if (t >= 64) (loLo != 0L) || ((loHi & ((1L << (t - 64)) - 1)) != 0L)
      else (loLo & ((1L << t) - 1)) != 0L
    if (qLo != qHi || !remNonzero) return AmbiguousSnap
    // snap = floor((U + 2^t) / 2^(t+1)) — no boundary ⇒ no tie
    val aLo = uLo + (if (t < 64) 1L << t else 0L)
    var aHi = uHi + (if (t >= 64) 1L << (t - 64) else 0L)
    if (t < 64 && java.lang.Long.compareUnsigned(aLo, uLo) < 0) aHi += 1L
    val abs = shr(aHi, aLo, t + 1)
    if (bits < 0) -abs else abs
  }

  /** Unscaled (scale-15) long for |d| ≤ FastAbsMax, finite. Manual
    * parse of Double.toString: `[-]ddd.ddd[E[-]xx]`. */
  def snapUnscaled15(d: Double): Long = {
    val fast = snapFast15(d)
    if (fast != AmbiguousSnap) return fast
    snapViaString15(d)
  }

  /** The toString-based reference path (pre-r21 body of
    * `snapUnscaled15`) — the contract's definition; the integer fast
    * path above must agree wherever it answers. */
  def snapViaString15(d: Double): Long = {
    val s = java.lang.Double.toString(d)
    val n = s.length
    var i = 0
    var neg = false
    if (s.charAt(0) == '-') { neg = true; i = 1 }
    var mant = 0L // shortest-repr mantissa digits (≤ 17, fits long)
    var frac = 0
    var exp = 0
    var seenDot = false
    var break = false
    while (i < n && !break) {
      val c = s.charAt(i)
      if (c == '.') seenDot = true
      else if (c == 'E') { exp = Integer.parseInt(s.substring(i + 1)); break = true }
      else { mant = mant * 10L + (c - '0'); if (seenDot) frac += 1 }
      i += 1
    }
    val shift = 15 + exp - frac
    val abs =
      if (shift >= 0) mant * pow10(shift) // |d| ≤ 1e3 keeps this ≤ 1e18
      else if (shift < -18) 0L // mant < 1e18 < 10^19/2 ⇒ rounds to zero
      else {
        val p = pow10(-shift)
        val q = mant / p
        val r = mant % p
        if (2L * r >= p) q + 1L else q // HALF_UP (away from zero on |·|)
      }
    if (neg) -abs else abs
  }

  /** The reference path for the awkward range (1e3 < |d| < 1e15):
    * exactly Spark's Decimal(BigDecimal(Double.toString)) +
    * changePrecision(30,15,HALF_UP), as an unscaled BigInteger. */
  def snapUnscaledBig(d: Double): BigInteger =
    new JBigDecimal(java.lang.Double.toString(d))
      .setScale(15, RoundingMode.HALF_UP).unscaledValue()
}

/** The d(d+1)/2 + d exact decimal Gram/mean registers of a vector
  * stream, held as ONE aggregation buffer: for each upper-triangle
  * (i, j), Σ snap15(v_i·v_j); on the diagonal additionally
  * Σ snap15(v_i); plus the row count. Each register is a scale-15
  * unscaled accumulator — a fast long lane (flushed into a BigInteger
  * spill before it can overflow) so the per-row work is d(d+1)/2
  * snap+add operations with ZERO allocation on the hot path. All sums
  * are exact integers at scale 15, so merge order is irrelevant —
  * the aggregate is associative/commutative and bit-identical to the
  * explode+groupBy decimal-sum form it replaces (VERDICT r13: the
  * 2,080× Generate row amplification was s41's whole cost).
  */
final class GramRegisterBuffer(val dim: Int) {
  private val pairs = dim * (dim + 1) / 2
  var cnt: Long = 0L
  // registers: [0, pairs) = products, [pairs, pairs + dim) = diagonal x-sums
  val lo: Array[Long] = new Array[Long](pairs + dim)
  val big: Array[BigInteger] = new Array[BigInteger](pairs + dim)

  private val FlushAt = 8000000000000000000L // 8e18: |lo| past this spills

  @inline private def flush(r: Int): Unit = {
    val b = BigInteger.valueOf(lo(r))
    big(r) = if (big(r) == null) b else big(r).add(b)
    lo(r) = 0L
  }

  @inline def addSnapped(r: Int, d: Double): Unit = {
    // replicate cast(double as decimal(30,15)): NaN/±Inf and values
    // whose integer part exceeds 15 digits cast to NULL → sum skips
    if (java.lang.Double.isNaN(d) || d >= 1e15 || d <= -1e15) return
    if (d <= DecimalSnap.FastAbsMax && d >= -DecimalSnap.FastAbsMax) {
      lo(r) += DecimalSnap.snapUnscaled15(d)
      if (lo(r) > FlushAt || lo(r) < -FlushAt) flush(r)
    } else {
      val b = DecimalSnap.snapUnscaledBig(d)
      big(r) = if (big(r) == null) b else big(r).add(b)
    }
  }

  @inline def pairIndex(i: Int, j: Int): Int = // i ≤ j upper triangle
    i * dim - i * (i - 1) / 2 + (j - i)

  def update(a: Array[Double]): Unit = {
    cnt += 1L
    var i = 0
    var r = 0
    while (i < dim) {
      val vi = a(i)
      addSnapped(pairs + i, vi)
      var j = i
      while (j < dim) {
        addSnapped(r, vi * a(j))
        j += 1
        r += 1
      }
      i += 1
    }
  }

  /** Per-element-null row (old form: that element's products/x cast
    * from a null input → null → skipped; the row still counts). */
  def updateWithNulls(v: ArrayData): Unit = {
    cnt += 1L
    var i = 0
    while (i < dim) {
      if (!v.isNullAt(i)) {
        val vi = v.getDouble(i)
        addSnapped(pairs + i, vi)
        var j = i
        while (j < dim) {
          if (!v.isNullAt(j)) addSnapped(pairIndex(i, j), vi * v.getDouble(j))
          j += 1
        }
      }
      i += 1
    }
  }

  def merge(o: GramRegisterBuffer): Unit = {
    require(o.dim == dim, s"gram buffer dim mismatch: $dim vs ${o.dim}")
    cnt += o.cnt
    var r = 0
    while (r < lo.length) {
      o.flush(r)
      if (o.big(r) != null)
        big(r) = if (big(r) == null) o.big(r) else big(r).add(o.big(r))
      r += 1
    }
  }

  /** Exact unscaled total of register r. */
  def total(r: Int): BigInteger = {
    flush(r)
    if (big(r) == null) BigInteger.ZERO else big(r)
  }
}

/** graft_gram_registers(v: array<double>) →
  * array<struct<i int, j int, sp decimal(38,15), sx decimal(38,15),
  * cnt bigint>> — the exact one-pass PCA summary (upper-triangle Gram
  * sums, diagonal mean sums, count) with O(d²) state per buffer.
  * Spark plans it as ObjectHashAggregate with map-side partials: each
  * map task folds its rows into one register buffer, the shuffle
  * carries ONE serialized buffer per task (vs d(d+1)/2 exploded rows
  * per INPUT ROW in the Generate form), and the merge is exact
  * integer addition — so the result is bit-identical under any
  * partitioning or arrival order, which is what lets it drop into
  * s41's complete-mode stream state (the s33 QuantileAgg precedent).
  * Rows whose array is null or not dim-sized are skipped (the callers
  * filter them; the guard keeps the kernel total).
  */
final case class GramRegisterAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramRegisterBuffer]
  with UnaryLike[Expression] {

  require(dim > 0 && dim <= 1024, s"bad dim=$dim")

  override def prettyName: String = "graft_gram_registers"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      // sp/sx are nullable: a register whose exact total no longer
      // fits DECIMAL(38,15) evals to null (see eval), matching the
      // non-ANSI decimal-sum overflow of the SQL form this replaced
      StructField("sp", DecimalType(38, 15), nullable = true),
      StructField("sx", DecimalType(38, 15), nullable = true),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<double>, got ${other.sql}")
    }

  override def createAggregationBuffer(): GramRegisterBuffer =
    new GramRegisterBuffer(dim)

  override def update(buf: GramRegisterBuffer, input: InternalRow): GramRegisterBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        var hasNull = false
        var k = 0
        while (k < dim && !hasNull) { hasNull = arr.isNullAt(k); k += 1 }
        if (hasNull) buf.updateWithNulls(arr)
        else buf.update(arr.toDoubleArray())
      }
    }
    buf
  }

  override def merge(buf: GramRegisterBuffer, other: GramRegisterBuffer): GramRegisterBuffer = {
    buf.merge(other); buf
  }

  /** Decimal(38,15) wrap of an exact BigInteger total; null once the
    * unscaled value outgrows precision 38 (|sum| >= 1e23) — the
    * non-ANSI decimal-sum of the SQL form this aggregate replaced
    * overflows to NULL, and a throwing Decimal.apply here would be a
    * divergent failure mode at extreme row counts. */
  private def snap38(unscaled: BigInteger): Any = {
    val jbd = new JBigDecimal(unscaled, 15)
    if (jbd.precision > 38) null
    else org.apache.spark.sql.types.Decimal(jbd, 38, 15)
  }

  override def eval(buf: GramRegisterBuffer): Any = {
    if (buf.cnt == 0L) return new GenericArrayData(Array.empty[Any])
    val rows = new Array[Any](dim * (dim + 1) / 2)
    val zero = org.apache.spark.sql.types.Decimal(
      new JBigDecimal(BigInteger.ZERO, 15), 38, 15)
    var i = 0
    var r = 0
    while (i < dim) {
      val sx = snap38(buf.total(dim * (dim + 1) / 2 + i))
      var j = i
      while (j < dim) {
        val sp = snap38(buf.total(r))
        rows(r) = new GenericInternalRow(
          Array[Any](i, j, sp, if (j == i) sx else zero, buf.cnt))
        j += 1
        r += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: GramRegisterBuffer): Array[Byte] = {
    val regs = buf.lo.length
    val blobs = new Array[Array[Byte]](regs)
    var size = 4 + 8 + regs * 4
    var r = 0
    while (r < regs) {
      blobs(r) = buf.total(r).toByteArray
      size += blobs(r).length
      r += 1
    }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.dim).putLong(buf.cnt)
    r = 0
    while (r < regs) { bb.putInt(blobs(r).length).put(blobs(r)); r += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramRegisterBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new GramRegisterBuffer(bb.getInt())
    buf.cnt = bb.getLong()
    var r = 0
    while (r < buf.lo.length) {
      val blob = new Array[Byte](bb.getInt())
      bb.get(blob)
      buf.big(r) = new BigInteger(blob)
      r += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramRegisterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramRegisterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramRegisterAgg =
    copy(child = newChild)
}
