package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The s38 engine's cross-batch contract, which the single-batch
  * driver fixture can't exercise: a consecutive-error run that
  * STRADDLES a micro-batch boundary only exists through the restored
  * open-run counter, and the state survives a kill/restart from the
  * checkpoint; late/replayed events must be dropped by the
  * (us, event_id) cursor guard. Expected values are hand-derived from
  * the run semantics (tiny sequences), the same contract q42's SQL
  * oracle gates at the fixture.
  */
class ErrorRunsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  /** Final stats per user from the durable append sink: every metric
    * is non-decreasing across a user's emissions (closed runs only
    * accumulate, and the open-run bonus is exactly compensated when a
    * qualifying run closes), so the per-column max IS the final
    * emission — no reliance on sink row order. */
  private def sinkStats(path: String) = {
    import org.apache.spark.sql.functions.max
    spark.read.parquet(path)
      .groupBy($"user_id").agg(max($"n_runs").as("n_runs"),
        max($"longest_run").as("longest_run"),
        max($"n_errors").as("n_errors"))
      .collect().map(_.toSeq).toSet
  }

  test("an error run straddling the batch boundary stitches and survives restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("runs-ckpt"); val out = tmp("runs-out")
    val mem = MemoryStream[(Long, Long, Long, Boolean)]
    def startEngine() =
      StreamingOps.errorRuns(
          mem.toDF().toDF("user_id", "us", "event_id", "is_error")
            .as[StreamingOps.UserEvent], minRun = 2L)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // user 1: errors at us 1,2 (batch 1) + us 3 (batch 2) then a
    // non-error — one run of 3 whose tail crosses the boundary.
    // user 2: ONE error per batch (us 1 | us 2) — the run of 2 exists
    // only if the restored open-run counter carried batch 1's error.
    val b1 = Seq((1L, 1L, 1L, true), (1L, 2L, 2L, true),
      (2L, 1L, 3L, true))
    val b2 = Seq((1L, 3L, 4L, true), (1L, 4L, 5L, false),
      (2L, 2L, 6L, true), (2L, 3L, 7L, false))
    mem.addData(b1: _*)
    val q1 = startEngine()
    try q1.processAllAvailable() finally q1.stop()
    assert(sinkStats(out) == Set(Seq(1L, 1L, 2L, 2L)),
      "run 1: only user 1's open run of 2 should qualify")

    mem.addData(b2: _*)
    val q2 = startEngine()
    try q2.processAllAvailable() finally q2.stop()
    assert(sinkStats(out) ==
      Set(Seq(1L, 1L, 3L, 3L), Seq(2L, 1L, 2L, 2L)),
      "restarted runs diverge — user 2's run exists only through " +
        "state restored across the boundary")
  }

  test("replayed events are dropped by the cursor guard") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("runs-late-ckpt"); val out = tmp("runs-late-out")
    val mem = MemoryStream[(Long, Long, Long, Boolean)]
    def startEngine() =
      StreamingOps.errorRuns(
          mem.toDF().toDF("user_id", "us", "event_id", "is_error")
            .as[StreamingOps.UserEvent], minRun = 2L)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    val b1 = Seq((3L, 5L, 1L, true), (3L, 6L, 2L, true))
    // batch 2 replays us=5 (must be dropped) then closes the run
    val b2 = Seq((3L, 5L, 1L, true), (3L, 7L, 3L, false))
    mem.addData(b1: _*)
    val q1 = startEngine()
    try q1.processAllAvailable() finally q1.stop()
    mem.addData(b2: _*)
    val q2 = startEngine()
    try q2.processAllAvailable() finally q2.stop()
    assert(sinkStats(out) == Set(Seq(3L, 1L, 2L, 2L)),
      "replayed error double-counted — the (us, event_id) guard failed")
  }
}
