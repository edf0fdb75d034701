package graft.sources

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of two bucketed tables on the bucket key runs with no shuffle") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-buckets").toString
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select($"vec_id", $"label")
    val o = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select($"vec_id", size($"embedding").as("dim"))
    Bucketing.writeBucketed(e, s"$dir/a", "graft_bkt_a", "vec_id", 4)
    Bucketing.writeBucketed(o, s"$dir/b", "graft_bkt_b", "vec_id", 4)
    try {
      // hint("merge"): the fixture is small enough to broadcast, which
      // would bypass (and disable) bucketing; at real scale SMJ is the
      // default and the hint is unnecessary
      val joined = spark.table("graft_bkt_a").hint("merge")
        .join(spark.table("graft_bkt_b").hint("merge"), "vec_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == e.count())
      // same join on the raw (unbucketed) parquet does shuffle — the
      // bucketing is what removed it, not the data size
      val raw = e.join(o, "vec_id")
      val rawPlan = raw.queryExecution.executedPlan.toString
      val rawNoBroadcast = e.hint("merge").join(o.hint("merge"), "vec_id")
      assert(rawNoBroadcast.queryExecution.executedPlan.toString
        .contains("Exchange"), s"expected shuffle in unbucketed join:\n$rawPlan")
    } finally {
      Bucketing.drop(spark, "graft_bkt_a")
      Bucketing.drop(spark, "graft_bkt_b")
    }
  }
}
