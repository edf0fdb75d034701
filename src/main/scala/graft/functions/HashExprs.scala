package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}

/** Native Catalyst expressions for the text-dedup hash kernels.
  *
  * The higher-order-function forms of SimHash/MinHash are O(tokens × 64)
  * resp. O(shingles × k) *array materializations* per row (each `zip_with`
  * / `transform` step allocates); these expressions do the same math in
  * one tight primitive loop per row with zero allocation beyond the
  * output, and generate straight-line Java via `doGenCode` so they stay
  * inside WholeStageCodegen. Semantics of the hash itself match Spark's
  * `xxhash64` (XXH64 over the UTF-8 bytes, same as the HOF versions).
  */
object HashKernels {

  /** One-pass 64-bit SimHash over the xxhash64 of each token. */
  def simhash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** One-pass vocabulary term counting: counts(i) = occurrences of
    * vocab term i in the token array. O(tokens) hash probes; see
    * TermCountsExpr. */
  def termCounts(arr: ArrayData,
      index: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer],
      vocabSize: Int): Array[Int] = {
    val counts = new Array[Int](vocabSize)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val p = index.get(arr.getUTF8String(i))
        if (p != null) counts(p.intValue()) += 1
      }
      i += 1
    }
    counts
  }

  /** One-pass k-slot min-hash signature, value-identical to the HOF
    * form `array_min(transform(sh, t -> xxhash64(t, slot + 1)))`:
    * Spark's multi-arg xxhash64 CHAINS — bytes hashed with seed 42,
    * then the int literal mixed with that result as seed — so the
    * expensive byte hash happens once per shingle and the k per-slot
    * values are k cheap int-mixes of it. Returns null when there are
    * no shingles (the HOF array_min of an empty array is null) — a
    * sentinel signature here would make every short doc an exact LSH
    * match of every other.
    */
  def minhash(arr: ArrayData, k: Int): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val s = arr.getUTF8String(i)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        var j = 0
        while (j < k) {
          val h = XXH64.hashInt(j + 1, base)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (any) mins else null
  }
}

/** simhash64(tokens: array<string>) → bigint. */
final case class SimHash64Expr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, ArrayType(StringType), ignoreNullability = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** minhash_signature(shingles: array<string>, k) → array<bigint>. */
final case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0 && k <= 1024, s"bad k=$k")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, ArrayType(StringType), ignoreNullability = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty shingle set -> null
  override def prettyName: String = "graft_minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val m = HashKernels.minhash(input.asInstanceOf[ArrayData], k)
    if (m == null) null else new GenericArrayData(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("mh")
      s"""long[] $tmp = graft.functions.HashKernels.minhash($c, $k);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object HashKernels2 {
  /** Fused n-gram-shingle MinHash: slides an n-token window, builds the
    * shingle's UTF-8 bytes (tokens joined by ' ') in a reusable buffer,
    * hashes once, and folds the k per-slot mins — value-identical to
    * `minhash(array_distinct(transform(seq, i -> concat_ws(' ', ...))))`
    * because (a) the byte stream equals concat_ws output and (b) min is
    * duplicate-insensitive, so the distinct step is unnecessary. Saves
    * the per-shingle string/array materializations of the two-step form.
    */
  def minhashShingles(toks: ArrayData, n: Int, k: Int): Array[Long] = {
    val numToks = toks.numElements()
    if (numToks < n) return null // no shingles -> null, like minhash()
    val mins = Array.fill(k)(Long.MaxValue)
    var buf = new Array[Byte](256)
    var i = 0
    while (i <= numToks - n) {
      var len = 0
      var j = 0
      while (j < n) {
        val s = toks.getUTF8String(i + j)
        val nb = s.numBytes
        if (len + nb + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + nb + 1))
        s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
        len += nb
        if (j < n - 1) { buf(len) = ' '; len += 1 }
        j += 1
      }
      val base = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      var slot = 0
      while (slot < k) {
        val h = XXH64.hashInt(slot + 1, base)
        if (h < mins(slot)) mins(slot) = h
        slot += 1
      }
      i += 1
    }
    mins
  }

  /** Positioned L-gram hashes: one xxhash64 per window start, over the
    * same tokens-joined-by-' ' byte stream `minhashShingles` builds —
    * the production-hash sibling of the md5 gram pipeline (exact
    * substring dedup, d82), POSITIONED (no distinct: slot i is the
    * gram starting at token i). */
  def gramHashes(toks: ArrayData, l: Int): Array[Long] = {
    val numToks = toks.numElements()
    if (numToks < l) return null
    val out = new Array[Long](numToks - l + 1)
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
      out(i) = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      i += 1
    }
    out
  }

  /** The engine's md5-derived sketch coins all parse a hex PREFIX of
    * the digest back into an integer:
    * `cast(conv(substring(md5(x), 1, k), 16, 10) as bigint)`. That
    * chain materializes the 32-char hex string, substrings it, and
    * re-parses base-16 — three string allocations per call on
    * per-gram-occurrence hot paths (HLL registers, bloom positions,
    * classifier/perplexity bucket hashes). This kernel computes the
    * digest once and folds the first k nibbles directly:
    * value-identical because the hex rendering is just the digest's
    * nibble sequence and `conv` parses it back unsigned (k ≤ 15 keeps
    * the value under 2^60, inside Long). MessageDigest is per-thread
    * (not thread-safe, and allocating one per row is exactly the
    * garbage this kernel exists to avoid). */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Prefix(bytes: Array[Byte], hexDigits: Int): Long =
    md5PrefixRange(bytes, bytes.length, hexDigits)

  /** Same coin over the first `len` bytes of a reusable buffer — the
    * zero-copy entry the gram-walk kernels use. */
  def md5PrefixRange(bytes: Array[Byte], len: Int, hexDigits: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, 0, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < hexDigits) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  /** The full md5 digest as a 3-long sort key: the 32 nibbles split
    * [0,15), [15,30), [30,32) and each run parsed as a non-negative
    * long. Elementwise array order over the key is EXACTLY the
    * lexicographic order of the digest's 32-char lowercase-hex
    * rendering (hex is a monotone per-nibble encoding and all three
    * limbs are zero-extended), so an ORDER BY on the key reproduces an
    * ORDER BY on md5-hex — the d24 family's oracle-shared ordering
    * coin — with zero string materialization and 8-byte comparisons
    * (VERDICT r19 next 6: the last hex round-trip class left after the
    * r19 md5Prefix sweep). */
  def md5SortKey(bytes: Array[Byte]): Array[Long] = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes)
    val d = md.digest()
    def nib(start: Int, n: Int): Long = {
      var v = 0L
      var i = start
      while (i < start + n) {
        val b = d(i >> 1) & 0xff
        v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
        i += 1
      }
      v
    }
    Array(nib(0, 15), nib(15, 15), nib(30, 2))
  }

  /** One-pass sign-LSH band codes: project v on every hyperplane (flat
    * row-major planes matrix), take sign bits, pack `bitsPerBand` bits
    * per band with the band index folded into the high bits —
    * value-identical to the HOF `VectorOps.bandCodes` form.
    */
  def signLsh(v: ArrayData, planes: Array[Double], dim: Int,
      bitsPerBand: Int): Array[Long] = {
    val nPlanes = planes.length / dim
    val bands = nPlanes / bitsPerBand
    val codes = new Array[Long](bands)
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var j = 0
      val off = p * dim
      while (j < dim) { dot += v.getDouble(j) * planes(off + j); j += 1 }
      if (dot >= 0.0) codes(p / bitsPerBand) |= (1L << (p % bitsPerBand))
      p += 1
    }
    var b = 0
    while (b < bands) { codes(b) += b.toLong << bitsPerBand; b += 1 }
    codes
  }
}

/** minhash_shingles(tokens: array<string>, n, k) → array<bigint>. */
final case class MinHashShinglesExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n > 0 && k > 0 && k <= 1024, s"bad n=$n k=$k")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, ArrayType(StringType),
        ignoreNullability = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // fewer than n tokens -> null
  override def prettyName: String = "graft_minhash_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val m = HashKernels2.minhashShingles(input.asInstanceOf[ArrayData], n, k)
    if (m == null) null else new GenericArrayData(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("mhs")
      s"""long[] $tmp = graft.functions.HashKernels2.minhashShingles($c, $n, $k);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashShinglesExpr =
    copy(child = newChild)
}

/** gram_hashes(tokens: array<string>, l) → array<bigint>: one xxhash64
  * per positioned L-gram window (the d82 production-hash kernel). */
final case class GramHashesExpr(child: Expression, l: Int)
    extends UnaryExpression {
  require(l > 0 && l <= 1024, s"bad l=$l")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, ArrayType(StringType),
        ignoreNullability = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // fewer than l tokens -> null
  override def prettyName: String = "graft_gram_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val h = HashKernels2.gramHashes(input.asInstanceOf[ArrayData], l)
    if (h == null) null else new GenericArrayData(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("gh")
      s"""long[] $tmp = graft.functions.HashKernels2.gramHashes($c, $l);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
}

/** md5_prefix(bin: binary, hexDigits) → bigint: the first `hexDigits`
  * hex characters of md5(bin) parsed base-16 — value-identical to
  * `cast(conv(substring(md5(bin), 1, hexDigits), 16, 10) as bigint)`
  * with zero string materialization (see [[HashKernels2.md5Prefix]]).
  * The md5 coin itself stays: it is the hash both engines share, so
  * every oracle keeps gating the sketch values bit-for-bit. */
final case class Md5PrefixExpr(child: Expression, hexDigits: Int)
    extends UnaryExpression {
  require(hexDigits >= 1 && hexDigits <= 15, s"bad hexDigits=$hexDigits")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels2.md5Prefix(input.asInstanceOf[Array[Byte]], hexDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels2.md5Prefix($c, $hexDigits)")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixExpr =
    copy(child = newChild)
}

/** md5_sort_key(bin: binary) → array<bigint>: md5(bin)'s 32 nibbles as
  * three non-negative longs ([15,15,2] nibbles) whose elementwise array
  * order equals the hex string's lexicographic order — the ordering
  * twin of [[Md5PrefixExpr]] for sites that sort on the FULL digest
  * (see [[HashKernels2.md5SortKey]]). The md5 coin itself stays: it is
  * the hash both engines share, so the oracle keeps gating the order
  * bit-for-bit. */
final case class Md5SortKeyExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_sort_key"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      HashKernels2.md5SortKey(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashKernels2.md5SortKey($c))")

  override protected def withNewChildInternal(newChild: Expression): Md5SortKeyExpr =
    copy(child = newChild)
}

/** sign_lsh(v: array<double>) → array<bigint> band codes; the planes
  * matrix is a driver-side constant carried by the expression (the C3
  * broadcast-operand pattern: small, replicated, never shuffled).
  */
final case class SignLshExpr(child: Expression, planes: Array[Double],
    dim: Int, bitsPerBand: Int) extends UnaryExpression {
  require(planes.length % dim == 0 &&
    (planes.length / dim) % bitsPerBand == 0, "bad planes/dim/bits shape")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType,
        ArrayType(org.apache.spark.sql.types.DoubleType),
        ignoreNullability = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_lsh"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(HashKernels2.signLsh(
      input.asInstanceOf[ArrayData], planes, dim, bitsPerBand))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashKernels2.signLsh($c, $planesRef, $dim, $bitsPerBand))")
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshExpr =
    copy(child = newChild)
}

object VecKernels {
  /** a·b, left fold in index order — value-identical to the HOF form
    * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` on equal-length
    * NULL-FREE double arrays (same IEEE op sequence, so the same bits
    * — the cross-engine-oracle requirement). Fails fast on a length
    * mismatch or a null element, both of which the HOF chain would
    * instead swallow to NULL: every caller compares co-schema'd
    * vectors, where either is a data bug worth a loud error — and a
    * silent primitive read would score a null element as 0.0, quietly
    * diverging from the documented HOF equivalence (ADVICE r10).
    * `checkNulls` is baked in at codegen from the static element
    * nullability, so provably null-free inputs pay nothing. */
  def dot(a: ArrayData, b: ArrayData, checkNulls: Boolean): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"dot over mismatched lengths: $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i)))
        throw new IllegalArgumentException(
          s"dot over a null element at index $i: vector columns must be null-free")
      s += a.getDouble(i) * b.getDouble(i); i += 1
    }
    s
  }

  /** cosine(a, b) = a·b / (√(a·a)·√(b·b)) — the three dots are
    * separate index-order folds fused into one pass (per-sum order is
    * unchanged, so every partial is bit-identical to three `dot`
    * calls), then the identical sqrt/multiply/divide tail as the HOF
    * rendering and the DuckDB oracle. */
  def cosine(a: ArrayData, b: ArrayData, checkNulls: Boolean): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"cosine over mismatched lengths: $n vs ${b.numElements()}")
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i)))
        throw new IllegalArgumentException(
          s"cosine over a null element at index $i: vector columns must be null-free")
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    ab / (java.lang.Math.sqrt(aa) * java.lang.Math.sqrt(bb))
  }

  /** Nearest-centroid scan (N5+N6): squared-L2 against every centroid
    * (flat row-major k×d matrix), strictly-less update ⇒ lowest cid on
    * ties — value-identical to the HOF
    * `array_min(array(struct(sqdist, cid)...))` form: per-dim left-fold
    * sums in index order, lexicographic (dist2, cid) min.
    */
  def nearest(v: ArrayData, cents: Array[Double], d: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val k = cents.length / d
    // best starts at 0, not -1: a NaN in v makes every comparison false
    // and must still yield a valid cid (cluster 0, matching stepBlock)
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      var dist = 0.0
      var j = 0
      val off = c * d
      while (j < d) {
        val t = v.getDouble(j) - cents(off + j)
        dist += t * t
        j += 1
      }
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, best))
  }
}

/** nearest_centroid(v: array<double>) → struct<dist2: double, cid: int>.
  * The centroid matrix is a driver-side constant on the expression (the
  * reference's broadcast-centroids J3/C3 pattern); one tight loop per
  * row replaces k separate fold expressions, so k=1000+ works without
  * expression-tree blowup.
  */
final case class NearestCentroidExpr(child: Expression,
    centroids: Array[Double], d: Int) extends UnaryExpression {
  require(d > 0 && centroids.length % d == 0 && centroids.nonEmpty,
    "bad centroid matrix shape")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType,
        ArrayType(org.apache.spark.sql.types.DoubleType),
        ignoreNullability = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${child.dataType.sql}")
  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("dist2",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("cid",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(input: Any): Any =
    VecKernels.nearest(input.asInstanceOf[ArrayData], centroids, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecKernels.nearest($c, $centsRef, $d)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

/** Shared type check for the binary vector kernels. */
private[functions] trait VecBinaryExpr extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val want = ArrayType(org.apache.spark.sql.types.DoubleType)
    if (Seq(left, right).forall(c => DataType.equalsStructurally(
        c.dataType, want, ignoreNullability = true)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<double>, array<double>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  /** Element-nullability of the inputs, resolved at plan time: parquet
    * array columns are element-nullable by schema even when the data
    * never holds a null, so the kernels take a baked-in flag — a null
    * element then fails LOUDLY instead of silently reading as 0.0
    * (which would diverge from the HOF form these kernels are
    * documented bit-identical to: it yields NULL — ADVICE r10).
    * Provably null-free inputs skip the per-element check entirely.
    * lazy val, not def (ADVICE r11): children are fixed once the
    * expression is constructed (tree rewrites copy() a new node), so
    * the interpreted path must not re-derive this per row. */
  protected lazy val elementsNullable: Boolean = Seq(left, right).exists(
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })
}

/** graft_dot(a, b) → double: index-order a·b in one codegen'd loop —
  * replaces the interpreted `aggregate(zip_with(...))` HOF chain
  * (which allocates a zipped array per row and stays outside
  * WholeStageCodegen) on the ANN/dedup scoring hot paths. Value- and
  * bit-identical to the HOF form (VecExprsSpec). */
final case class DotExpr(left: Expression, right: Expression)
    extends VecBinaryExpr {
  override def prettyName: String = "graft_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elementsNullable)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.dot($a, $b, $elementsNullable)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotExpr = copy(left = newLeft, right = newRight)
}

/** graft_cosine(a, b) → double: the three index-order dots fused into
  * one pass + the identical sqrt/divide tail as the HOF rendering and
  * the DuckDB oracle. One codegen'd loop per scored pair instead of
  * three interpreted HOF folds with six array allocations. */
final case class CosineExpr(left: Expression, right: Expression)
    extends VecBinaryExpr {
  override def prettyName: String = "graft_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elementsNullable)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.cosine($a, $b, $elementsNullable)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineExpr = copy(left = newLeft, right = newRight)
}

/** graft_opaque(e) → e: value-identity wrapper that REPORTS
  * non-determinism, the guide-sanctioned barrier against the
  * optimizer duplicating an expensive projection (guide §4.4 — the
  * filter-on-derived-column rewrite substitutes the alias's whole
  * expression tree into the pushed-down Filter, so a 32-cosine screen
  * column gets evaluated twice per row: once below the filter, once
  * in the surviving Project). Wrapping the alias blocks
  * PushPredicateThroughNonJoin's substitution and CollapseProject's
  * inlining; eval and codegen delegate to the child unchanged, so the
  * value stream is bit-identical — only the plan shape moves. Use it
  * on expensive aliases that a downstream filter consumes; it also
  * blocks legitimate reorderings past the projection, so don't apply
  * it blanket (the guide's caveat).
  */
final case class OpaqueExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_opaque"
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OpaqueExpr =
    copy(child = newChild)
}

object TextKernels {
  import org.apache.spark.unsafe.types.UTF8String

  private def isWs(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == 0x0B.toByte || b == '\f'.toByte || b == '\r'.toByte

  /** Normalize-and-tokenize in one pass, value-identical to
    * `split(lower(trim(regexp_replace(s, "\\s+", " "))), " ")`:
    * tokens are maximal runs not containing the regex \s class
    * ([ \t\n\x0B\f\r]), lowercased with Spark's own UTF8String
    * lowercasing; an all-whitespace/empty input yields [""] (split of
    * an empty string), matching the HOF chain's edge case. One scan of
    * the bytes instead of three regex/string passes per row.
    *
    * Multi-byte UTF-8 is safe to scan bytewise: continuation bytes
    * have the high bit set and can never equal the ASCII whitespace
    * byte values.
    */
  def normTokens(s: UTF8String): GenericArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes // materialized copy, offset 0
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        out += UTF8String.fromBytes(bytes, start, i - start)
      }
    }
    if (out.isEmpty) out += UTF8String.EMPTY_UTF8
    new GenericArrayData(out.toArray)
  }
}

/** norm_tokens(text: string) → array<string>. */
final case class NormTokensExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_norm_tokens"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.normTokens(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.normTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): NormTokensExpr =
    copy(child = newChild)
}

/** term_counts(tokens: array<string>) → array<int>: occurrence count
  * of each FIXED vocabulary term in the token array, aligned to the
  * vocabulary's order. The one-pass replacement for per-term
  * `size(filter(tokens, x -> x = t))` scans: the HOF form costs
  * O(tokens · |vocab|) interpreted lambda calls per row (it made the
  * s17 streaming scorer the suite's slowest query at 15.7 s), this
  * kernel costs O(tokens) hash probes in straight-line Java inside
  * WholeStageCodegen. Value-identical to the HOF form: the probe is
  * UTF8String binary equality, the same comparison `x = t` compiles
  * to.
  */
final case class TermCountsExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  require(vocab.nonEmpty && vocab.size <= (1 << 20),
    s"vocab must be non-empty and bounded, got ${vocab.size}")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, ArrayType(StringType), ignoreNullability = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${child.dataType.sql}")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_term_counts"

  // built once per task from the vocab (UTF8String keys hash/compare
  // on bytes, matching the engine's string equality); shipped to
  // executors via the codegen references array
  @transient private lazy val index: java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, Integer] = {
    val m = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, Integer](vocab.size * 2)
    vocab.zipWithIndex.foreach { case (t, i) =>
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(t),
        Integer.valueOf(i))
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(HashKernels.termCounts(
      input.asInstanceOf[ArrayData], index, vocab.size))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("vocabIndex", index,
      "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashKernels.termCounts($c, $idxRef, ${vocab.size}))")
  }

  override protected def withNewChildInternal(newChild: Expression): TermCountsExpr =
    copy(child = newChild)
}

/** Per-doc n-gram repetition statistics for the Gopher rule battery
  * (d43): for each window width n, the max single-gram occurrence
  * count, the total occurrences of repeated grams, and the window
  * count — computed row-locally in one kernel call.
  *
  * The explode form shuffled ~Σ n (= 24×) token-count (doc, n, gram)
  * rows through TWO hash aggregations per scored corpus; this kernel
  * is a map-only projection (zero Exchange, zero Generate — pinned in
  * GopherAndPerplexitySpec), per-row memory bounded by document length.
  * Exactness: grams are compared as TOKEN SEQUENCES via per-doc
  * interned ids — identical to the concat_ws(' ') string equality the
  * explode form grouped on, since whitespace-split tokens cannot
  * contain the separator (no hashing shortcut, no collision risk).
  */
object GopherKernels {
  /** int[]-keyed map entry: exact sequence equality, cached hash. */
  private final class Key(val ids: Array[Int], val hash: Int) {
    override def hashCode(): Int = hash
    override def equals(o: Any): Boolean = o match {
      case k: Key => java.util.Arrays.equals(ids, k.ids)
      case _ => false
    }
  }

  /** Returns structs (n, max_c, dup_occ, tot) in `ns` order. */
  def gopherStats(toks: ArrayData, ns: Array[Int]): GenericArrayData = {
    val len = toks.numElements()
    val ids = new Array[Int](len)
    val intern = new java.util.HashMap[UTF8String, Integer](len * 2)
    var i = 0
    while (i < len) {
      val t = toks.getUTF8String(i)
      var id = intern.get(t)
      if (id == null) { id = Integer.valueOf(intern.size); intern.put(t, id) }
      ids(i) = id.intValue()
      i += 1
    }
    val out = new Array[Any](ns.length)
    var k = 0
    while (k < ns.length) {
      val n = ns(k)
      val windows = len - n + 1
      var maxC = 0L
      var dupOcc = 0L
      if (windows > 0) {
        val counts = new java.util.HashMap[Key, Array[Long]](windows * 2)
        var p = 0
        while (p < windows) {
          val w = java.util.Arrays.copyOfRange(ids, p, p + n)
          val key = new Key(w, java.util.Arrays.hashCode(w))
          val slot = counts.get(key)
          if (slot == null) counts.put(key, Array(1L)) else slot(0) += 1L
          p += 1
        }
        val it = counts.values().iterator()
        while (it.hasNext) {
          val c = it.next()(0)
          if (c > maxC) maxC = c
          if (c > 1L) dupOcc += c
        }
      }
      out(k) = new GenericInternalRow(Array[Any](
        n, maxC, dupOcc, math.max(windows, 0).toLong))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** gopher_stats(toks: array<string>) →
  * array<struct<n int, max_c bigint, dup_occ bigint, tot bigint>>,
  * one row per window width in `ns` order (see [[GopherKernels]]). */
final case class GopherStatsExpr(child: Expression, ns: Seq[Int])
    extends UnaryExpression {
  require(ns.nonEmpty && ns.forall(n => n >= 1 && n <= 64), s"bad ns=$ns")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, ArrayType(StringType), ignoreNullability = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("n", IntegerType, nullable = false),
      StructField("max_c", LongType, nullable = false),
      StructField("dup_occ", LongType, nullable = false),
      StructField("tot", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_gopher_stats"

  @transient private lazy val nsArr: Array[Int] = ns.toArray

  override protected def nullSafeEval(input: Any): Any =
    GopherKernels.gopherStats(input.asInstanceOf[ArrayData], nsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("gopherNs", nsArr, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GopherKernels.gopherStats($c, $nsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

/** Column-API facade for the native kernels. */
object GraftFunctions {
  def simhash64(tokens: Column): Column =
    column(SimHash64Expr(expression(tokens)))
  def minhashSignature(shingles: Column, k: Int): Column =
    column(MinHashSigExpr(expression(shingles), k))
  def minhashShingles(tokens: Column, n: Int, k: Int): Column =
    column(MinHashShinglesExpr(expression(tokens), n, k))
  def gramHashes(tokens: Column, l: Int): Column =
    column(GramHashesExpr(expression(tokens), l))
  def md5Prefix(bin: Column, hexDigits: Int): Column =
    column(Md5PrefixExpr(expression(bin), hexDigits))
  def md5SortKey(bin: Column): Column =
    column(Md5SortKeyExpr(expression(bin)))
  def signLsh(v: Column, planes: Array[Array[Double]], bitsPerBand: Int): Column = {
    val dim = planes.head.length
    column(SignLshExpr(expression(v), planes.flatten, dim, bitsPerBand))
  }
  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column =
    column(NearestCentroidExpr(expression(v), centroids.flatten,
      centroids.head.length))
  def normTokens(text: Column): Column =
    column(NormTokensExpr(expression(text)))
  def termCounts(tokens: Column, vocab: Seq[String]): Column =
    column(TermCountsExpr(expression(tokens), vocab))
  def dot(a: Column, b: Column): Column =
    column(DotExpr(expression(a), expression(b)))
  def cosine(a: Column, b: Column): Column =
    column(CosineExpr(expression(a), expression(b)))
  def opaque(c: Column): Column =
    column(OpaqueExpr(expression(c)))
  /** Bounded top-k aggregate: k smallest (ns, vid) pairs, ascending. */
  def boundedTopK(ns: Column, vid: Column, k: Int): Column =
    column(BoundedTopKAgg(expression(ns), expression(vid), k)
      .toAggregateExpression())
  /** KMV bottom-k: the k smallest DISTINCT bigint values, ascending. */
  def minKDistinct(v: Column, k: Int): Column =
    column(MinKDistinctAgg(expression(v), k).toAggregateExpression())
  /** HLL registers over per-doc L-gram walks: 256-byte mergeable state. */
  def hllRegs(toks: Column, l: Int): Column =
    column(HllRegsAgg(expression(toks), l).toAggregateExpression())
  /** Exact decimal PCA summary: upper-triangle Gram + mean registers. */
  def gramRegisters(v: Column, dim: Int): Column =
    column(GramRegisterAgg(expression(v), dim).toAggregateExpression())
  /** Per-doc Gopher repetition statistics, one struct per width. */
  def gopherStats(toks: Column, ns: Seq[Int]): Column =
    column(GopherStatsExpr(expression(toks), ns))
}
