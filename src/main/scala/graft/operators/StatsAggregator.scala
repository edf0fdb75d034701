package graft.operators

import graft.damds.DamdsKernels.DStats
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed one-pass `Aggregator` form of DoubleStatistics (A6) — the
  * second rendering SURVEY §7.1 step 4 declares next to the
  * expression-based q09. `reduce` is the reference's per-element
  * accept, `merge` its associative combine (damds/Statistics.java:
  * 20-26, 30-47): one pass, six summaries, map-side partials handled by
  * Spark's typed aggregation.
  */
object StatsAggregator extends Aggregator[Double, DStats, DStats] {

  override def zero: DStats = DStats(0L, Double.PositiveInfinity,
    Double.NegativeInfinity, Double.PositiveInfinity, 0.0, 0.0)

  override def reduce(b: DStats, v: Double): DStats = DStats(
    b.count + 1,
    math.min(b.vmin, v),
    math.max(b.vmax, v),
    if (v > 0.0) math.min(b.positiveMin, v) else b.positiveMin,
    b.sum + v,
    b.sumSq + v * v)

  override def merge(a: DStats, b: DStats): DStats = a.combine(b)

  override def finish(r: DStats): DStats = r

  override def bufferEncoder: Encoder[DStats] = Encoders.product[DStats]
  override def outputEncoder: Encoder[DStats] = Encoders.product[DStats]
}
