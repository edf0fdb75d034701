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
}
