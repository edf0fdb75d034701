package graft.text

import org.apache.spark.sql.Dataset

/** Mergeable quantile summary over Long values — the fourth member of
  * the sketch family next to KMV/HLL (distinct, d46/d49), Misra-Gries
  * (frequent items, d55), and the bounded histogram (d47): the one
  * that answers rank/quantile queries over an UNBOUNDED value domain
  * from per-shard state, where d47's exact histogram needs a bounded
  * domain.
  *
  * The structure is the multi-level compactor of Manku-Rajagopalan-
  * Lindsay / KLL (Karnin-Lang-Liberty, FOCS 2016) with a DETERMINISTIC
  * alternating compaction offset instead of coin flips: each level
  * holds up to k items of weight 2^level; a full level sorts, keeps
  * every other item (offset alternating per level compaction), and
  * promotes the survivors with doubled weight. Dropping every other
  * item of a sorted weight-w run perturbs any rank by at most w, so
  * the sketch CARRIES its own certified bound: `errBound` accumulates
  * w per compaction, and every quantile answer is guaranteed within
  * ±errBound of the true rank — a self-certifying error budget the
  * spec checks against exact ranks (QuantileSketchSpec), the same
  * gate-by-theorem discipline as the Misra-Gries summary. Merging
  * concatenates levels pointwise and re-compacts; the budgets add, so
  * the bound survives arbitrary merge trees (mergeable-summaries
  * property). With k ≥ n nothing ever compacts, errBound stays 0, and
  * the sketch degenerates to exact ranks — the regime the d64 driver
  * gate runs in, making the whole pipeline (buffering, merge tree,
  * weighted rank walk) SQL-oracle-checkable while the compacting
  * regime stays theorem-gated at 10× scale.
  *
  * Like the other sketches, results in the compacting regime are
  * partition-layout-dependent WITHIN the certified band — which is why
  * the exact d47 query stays the oracle anchor and this one is bounded
  * by its own budget.
  */
object QuantileSketch {

  /** `levels(i)` holds SORTED items of weight 2^i; `n` is total stream
    * mass; `errBound` the certified max rank error; `flip` the
    * deterministic compaction-offset state per level. */
  final case class Sketch(k: Int, levels: Vector[Vector[Long]], n: Long,
      errBound: Long, flips: Vector[Boolean]) {
    def retained: Int = levels.map(_.size).sum
  }

  def empty(k: Int): Sketch = {
    require(k >= 2, "k must be at least 2")
    Sketch(k, Vector(Vector.empty), 0L, 0L, Vector(false))
  }

  /** Compact every full level bottom-up. A level of size > k sorts
    * (levels are kept sorted by construction), keeps the items at the
    * alternating offset, and promotes them with doubled weight;
    * leftover odd items stay put, so no mass is lost. */
  private def compact(s: Sketch): Sketch = {
    var levels = s.levels
    var flips = s.flips
    var err = s.errBound
    var i = 0
    while (i < levels.size) {
      if (levels(i).size > s.k) {
        val lv = levels(i)
        // only an EVEN count compacts — an odd tail item stays at the
        // level so total weighted mass is conserved exactly (half the
        // items at doubled weight = the compacted mass); dropping
        // every other item of the sorted even run perturbs any rank
        // by at most one weight unit 2^i (the compactor invariant
        // errBound certifies)
        val (run, rest) =
          if (lv.size % 2 == 0) (lv, Vector.empty[Long])
          else (lv.init, Vector(lv.last))
        val off = if (flips(i)) 1 else 0
        flips = flips.updated(i, !flips(i))
        val survivors = run.indices.collect {
          case j if j % 2 == off => run(j)
        }.toVector
        if (i + 1 == levels.size) {
          levels = levels :+ Vector.empty
          flips = flips :+ false
        }
        levels = levels
          .updated(i, rest)
          .updated(i + 1, merged(levels(i + 1), survivors))
        err += (1L << i)
      }
      i += 1
    }
    Sketch(s.k, levels, s.n, err, flips)
  }

  private def merged(a: Vector[Long], b: Vector[Long]): Vector[Long] = {
    // merge of two sorted runs
    val out = Vector.newBuilder[Long]
    var i = 0; var j = 0
    while (i < a.size && j < b.size) {
      if (a(i) <= b(j)) { out += a(i); i += 1 } else { out += b(j); j += 1 }
    }
    while (i < a.size) { out += a(i); i += 1 }
    while (j < b.size) { out += b(j); j += 1 }
    out.result()
  }

  /** One partition's sketch. Items land in level 0 (kept sorted by
    * buffering then one sort per fill), compacting as levels fill. */
  def fromPartition(it: Iterator[Long], k: Int): Sketch = {
    var s = empty(k)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    def flush(): Unit = if (buf.nonEmpty) {
      val sorted = buf.sorted.toVector
      buf.clear()
      s = compact(s.copy(
        levels = s.levels.updated(0, merged(s.levels(0), sorted)),
        n = s.n + sorted.size))
    }
    for (v <- it) {
      buf += v
      if (buf.size >= k) flush()
    }
    flush()
    s
  }

  /** Error-budget-preserving merge: pointwise sorted-run merge per
    * level, then compact; budgets add. */
  def merge(a: Sketch, b: Sketch): Sketch = {
    require(a.k == b.k, "cannot merge sketches with different k")
    val h = math.max(a.levels.size, b.levels.size)
    def lv(s: Sketch, i: Int): Vector[Long] =
      if (i < s.levels.size) s.levels(i) else Vector.empty
    def fl(s: Sketch, i: Int): Boolean =
      i < s.flips.size && s.flips(i)
    val levels = Vector.tabulate(h)(i => merged(lv(a, i), lv(b, i)))
    val flips = Vector.tabulate(h)(i => fl(a, i) ^ fl(b, i))
    compact(Sketch(a.k, levels, a.n + b.n, a.errBound + b.errBound, flips))
  }

  /** The weighted item expansion in value order: (value, weight). */
  private def weighted(s: Sketch): Seq[(Long, Long)] =
    s.levels.zipWithIndex
      .flatMap { case (lv, i) => lv.map(v => (v, 1L << i)) }
      .sortBy(_._1)

  /** Smallest value whose cumulative weight reaches `rank` (1-based).
    * True rank of the answer is within ±errBound of `rank`. */
  def valueAtRank(s: Sketch, rank: Long): Long = {
    require(s.n > 0, "empty sketch")
    val r = math.max(1L, math.min(rank, s.n))
    var cum = 0L
    val it = weighted(s).iterator
    var last = Long.MinValue
    while (cum < r && it.hasNext) {
      val (v, w) = it.next()
      cum += w; last = v
    }
    last
  }

  /** Distributed build: one sketch per partition, merged up a tree —
    * the FrequentItems shape; the driver never holds more than
    * O(k · log(n/k)) longs per merge input, whatever the corpus size. */
  def sketch(values: Dataset[Long], k: Int): Sketch =
    values.rdd
      .mapPartitions(it => Iterator.single(fromPartition(it, k)))
      .treeReduce(merge)

  // ---- the sketch as an aggregation buffer (streaming state) ----

  /** Encoder-friendly buffer: the sketch plus an unsorted staging run
    * so per-row updates are O(1) appends; staging folds into the
    * compactor every k rows, keeping state O(k · log(n/k)). */
  final case class AggBuf(k: Int, staging: Seq[Long], levels: Seq[Seq[Long]],
      n: Long, errBound: Long, flips: Seq[Boolean])
  final case class QRow(p: Long, rank: Long, q_value: Long, err_budget: Long)

  private def toSketch(b: AggBuf): Sketch = {
    val base = Sketch(b.k, b.levels.map(_.toVector).toVector, b.n,
      b.errBound, b.flips.toVector)
    if (b.staging.isEmpty) base
    else merge(base, fromPartition(b.staging.iterator, b.k))
  }
  private def toBuf(s: Sketch): AggBuf =
    AggBuf(s.k, Nil, s.levels, s.n, s.errBound, s.flips)

  /** Typed Aggregator over the sketch — the adapter that lets the
    * summary live in a streaming state store (s33: complete-mode
    * global agg whose state IS the compactor) or any SQL agg slot.
    * Finish emits the quantile rows for `ps` directly, so a sink
    * needs only one posexplode. */
  final class QuantileAgg(k: Int, ps: Seq[Long])
      extends org.apache.spark.sql.expressions.Aggregator[Long, AggBuf, Seq[QRow]] {
    def zero: AggBuf = toBuf(empty(k))
    def reduce(b: AggBuf, v: Long): AggBuf = {
      val st = b.staging :+ v
      if (st.size >= k) toBuf(toSketch(b.copy(staging = st)))
      else b.copy(staging = st)
    }
    def merge(a: AggBuf, b: AggBuf): AggBuf =
      toBuf(QuantileSketch.merge(toSketch(a), toSketch(b)))
    def finish(b: AggBuf): Seq[QRow] = {
      val s = toSketch(b)
      if (s.n == 0L) Seq.empty
      else ps.map { p =>
        val r = math.max(1L, (p * s.n + 99L) / 100L)
        QRow(p, r, valueAtRank(s, r), s.errBound)
      }
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[AggBuf] =
      org.apache.spark.sql.Encoders.product[AggBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[QRow]] = {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      ExpressionEncoder[Seq[QRow]]()
    }
  }
}
