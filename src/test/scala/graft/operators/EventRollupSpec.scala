package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-view-maintenance contract behind q38/q39: merging
  * aggregated deltas — at positive (append) or negative (retraction)
  * multiplicity — must be bit-identical to recomputation, because
  * count and DECIMAL-sum are abelian-group aggregates. The DuckDB
  * oracle gates both queries against the recompute SQL; this spec adds
  * the in-engine second path for the retraction leg and checks the
  * corrections actually retracted something (a no-op correction batch
  * would gate vacuously).
  */
class EventRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q39 retraction merge equals the in-engine recompute over survivors") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    import spark.implicits._
    val got = Catalog.queries("q39_rollup_retractions")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq).toSet
    val want = graft.Tables(spark, TestSpark.sf0001, "events")
      .filter($"event_id" % 10 =!= 3)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 2))).cast("double")
          .as("total_value"))
      .collect().map(_.toSeq).toSet
    assert(got == want,
      "merge-with-retractions must be bit-identical to recomputation")
    val full = Catalog.queries("q17_events_hourly")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq).toSet
    assert(got != full,
      "the correction batch must actually retract rows from the rollup")
  }

  test("q41 decay is bounded by the raw total and halves exactly per half-life") {
    // two structural theorems of the half-life rollup: (1) decay only
    // shrinks mass, so 0 < decayed <= total per type; (2) shifting the
    // anchor one half-life later scales every pre-rounding
    // contribution by exactly 1/2 (power-of-two scaling is exact), so
    // the shifted rollup must be half the original to within the
    // per-event micro-rounding budget (0.5e-6 × n events).
    val ev = graft.Tables(spark, TestSpark.sf0001, "events")
    val anchor = EventQueries.decayAnchorUs(ev)
    def byType(anchorUs: Long): Map[String, (Long, Double, Double)] =
      EventQueries.decayedCounts(ev, anchorUs).collect().map { r =>
        r.getAs[String]("event_type") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("total_value"),
            r.getAs[Double]("decayed_value")))
      }.toMap
    val base = byType(anchor)
    val shifted = byType(anchor + EventQueries.q41HalfLifeUs)
    assert(base.nonEmpty)
    base.foreach { case (t, (n, total, dec)) =>
      assert(dec > 0.0 && dec <= total,
        s"$t: decayed $dec outside (0, total=$total]")
      val budget = 0.5e-6 * n * 1.5
      assert(math.abs(shifted(t)._3 - dec / 2.0) <= budget,
        s"$t: shifted ${shifted(t)._3} not half of $dec within $budget")
    }
  }
}
