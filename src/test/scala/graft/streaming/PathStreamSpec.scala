package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The s42 engine's cross-batch contract, which the single-batch
  * driver fixture can't exercise: a trigram whose three events
  * STRADDLE a micro-batch boundary only exists through the restored
  * two-slot path context; a >gap silence across batches must clear
  * that context and bump the session index; the (us, event_id)
  * cursor drops replayed events; and all of it survives a
  * kill/restart from checkpoint. Expected hit sets are hand-derived
  * from tiny sequences — the same contract q44's SQL oracle gates on
  * the fixture.
  */
class PathStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private val gapUs = 1800000000L // 30 min, q18/q44's rule

  test("trigrams stitch across batches, sessions split on silence, replays drop") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("path-ckpt"); val out = tmp("path-out")
    val mem = MemoryStream[(Long, Long, Long, String)]
    def startEngine() =
      StreamingOps.sessionPaths(
          mem.toDF().toDF("user_id", "us", "event_id", "et")
            .as[StreamingOps.PathEvent], gapUs)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // batch 1 — user 1: a b (no trigram yet); user 2: a b c (one hit)
    mem.addData((1L, 1000L, 1L, "a"), (1L, 2000L, 2L, "b"),
      (2L, 1000L, 10L, "a"), (2L, 2000L, 11L, "b"), (2L, 3000L, 12L, "c"))
    val q1 = startEngine()
    try q1.processAllAvailable() finally q1.stop()

    // batch 2 after a RESTART — user 1: c arrives within the gap →
    // the a>b context restored from state completes a>b>c; then a
    // replay of event 2 (dropped by the cursor); then a >gap silence
    // followed by x y z → new session, fresh context, one hit x>y>z
    val far = 1000L + gapUs + 10_000_000L
    mem.addData((1L, 3000L, 3L, "c"), (1L, 2000L, 2L, "b"),
      (1L, far, 4L, "x"), (1L, far + 1000L, 5L, "y"),
      (1L, far + 2000L, 6L, "z"))
    val q2 = startEngine()
    try q2.processAllAvailable() finally q2.stop()

    val hits = spark.read.parquet(out)
      .select($"user_id", $"sess_idx", $"path")
      .as[(Long, Long, String)].collect().toSet
    assert(hits == Set(
      (2L, 0L, "a>b>c"),   // batch-1 in-batch trigram
      (1L, 0L, "a>b>c"),   // stitched across the batch boundary
      (1L, 1L, "x>y>z")),  // new session after the gap, fresh context
      s"unexpected hit set: $hits")
  }

  test("an empty-string event type is a real path step, not a warm-up hole") {
    // ADVICE r13: the old state overloaded "" as the unfilled-slot
    // sentinel, so an empty event_type silently suppressed its
    // trigrams — diverging from batch q44's LEAD windows, which emit
    // paths containing empty types. The filled-slot counter must emit
    // them.
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("path3-ckpt"); val out = tmp("path3-out")
    val mem = MemoryStream[(Long, Long, Long, String)]
    mem.addData((9L, 1000L, 1L, "a"), (9L, 2000L, 2L, ""),
      (9L, 3000L, 3L, "c"), (9L, 4000L, 4L, "d"))
    val q = StreamingOps.sessionPaths(
        mem.toDF().toDF("user_id", "us", "event_id", "et")
          .as[StreamingOps.PathEvent], gapUs)
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val hits = spark.read.parquet(out)
      .select($"user_id", $"sess_idx", $"path")
      .as[(Long, Long, String)].collect().toSet
    assert(hits == Set((9L, 0L, "a>>c"), (9L, 0L, ">c>d")),
      s"empty-type steps suppressed or mangled: $hits")
  }

  test("a replayed or late event never fabricates a trigram") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("path2-ckpt"); val out = tmp("path2-out")
    val mem = MemoryStream[(Long, Long, Long, String)]
    def startEngine() =
      StreamingOps.sessionPaths(
          mem.toDF().toDF("user_id", "us", "event_id", "et")
            .as[StreamingOps.PathEvent], gapUs)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    mem.addData((7L, 1000L, 1L, "a"), (7L, 2000L, 2L, "b"))
    val q1 = startEngine()
    try q1.processAllAvailable() finally q1.stop()
    // a full replay of batch 1 plus one out-of-order event before the
    // cursor: all dropped, so still no trigram exists
    mem.addData((7L, 1000L, 1L, "a"), (7L, 2000L, 2L, "b"),
      (7L, 1500L, 9L, "q"))
    val q2 = startEngine()
    try q2.processAllAvailable() finally q2.stop()
    // explicit schema: an all-dropped run writes no part files and
    // schema inference would fail on the empty sink
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sess_idx",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType)))
    assert(spark.read.schema(sch).parquet(out).count() == 0,
      "replayed events fabricated a path hit")
  }
}
