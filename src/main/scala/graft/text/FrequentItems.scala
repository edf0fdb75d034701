package graft.text

import org.apache.spark.sql.Dataset

import scala.collection.mutable

/** Misra-Gries frequent-items summaries — the bounded, MERGEABLE
  * sketch for "which terms exceed an N/(m+1) frequency floor" that
  * completes the streaming-sketch triad next to KMV/HLL (distinct,
  * d46/d49) and the bounded histogram (quantiles, d47).
  *
  * Guarantees (Misra–Gries 1982; merge form per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): for true count c(t) over N
  * items, the summary's estimate ĉ(t) (0 if absent) satisfies
  * c(t) − N/(m+1) ≤ ĉ(t) ≤ c(t) — so every term with
  * c(t) > N/(m+1) is RETAINED, and the error bound survives
  * arbitrary merge trees, which is what makes the sketch a partial
  * aggregate: one m-counter map per partition, one treeReduce merge,
  * m counters per shard forever. This is the per-partition imperative
  * kernel the RDD escape hatch exists for — the hot loop is a hash
  * map update per item, nothing relational.
  */
object FrequentItems {

  /** One partition's Misra-Gries summary: at most m counters. The
    * overflow step decrements EVERY counter by the count of the new
    * item (1) and drops zeros — each survivor has absorbed one
    * "charge" per decremented item, bounding total undercount by
    * N/(m+1). */
  def mg(it: Iterator[String], m: Int): Map[String, Long] = {
    require(m > 0, "m must be positive")
    val ctr = mutable.HashMap.empty[String, Long]
    for (t <- it) {
      ctr.get(t) match {
        case Some(c) => ctr(t) = c + 1L
        case None if ctr.size < m => ctr(t) = 1L
        case None =>
          // decrement-all; amortized O(1) per item because each unit
          // of decrement pays for one prior unit of increment
          val dead = mutable.ArrayBuffer.empty[String]
          ctr.mapValuesInPlace((_, c) => c - 1L)
          ctr.foreach { case (k, c) => if (c <= 0L) dead += k }
          dead.foreach(ctr.remove)
      }
    }
    ctr.toMap
  }

  /** Error-preserving merge: pointwise sum, then if over m counters,
    * subtract the (m+1)-th largest count from all and keep positives —
    * the subtraction charges every dropped unit against a distinct
    * unit of stream mass, so the summed error bounds ADD instead of
    * multiplying (the mergeable-summaries result). */
  def merge(a: Map[String, Long], b: Map[String, Long], m: Int)
      : Map[String, Long] = {
    val s = mutable.HashMap.empty[String, Long] ++= a
    b.foreach { case (k, v) => s.update(k, s.getOrElse(k, 0L) + v) }
    if (s.size <= m) s.toMap
    else {
      val thresh = s.values.toArray.sorted(Ordering[Long].reverse).apply(m)
      s.iterator.map { case (k, v) => k -> (v - thresh) }
        .filter(_._2 > 0L).toMap
    }
  }

  /** Distributed sketch: one MG summary per partition, merged up a
    * tree — the C1 reduce collective over m-sized maps. The driver
    * never sees more than m counters per merge input, whatever the
    * corpus size. */
  def sketch(terms: Dataset[String], m: Int): Map[String, Long] =
    terms.rdd
      .mapPartitions(it => Iterator.single(mg(it, m)))
      .treeReduce((a, b) => merge(a, b, m))
}
