package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The s47 engine's cross-batch contract, which the single-batch
  * driver fixture can't exercise: per-clip O(1) VAD state folds
  * windows arriving over MANY micro-batches (a voiced run straddling
  * a batch boundary is only continuous through the restored
  * prevVoiced), and the state survives a kill/restart from the
  * checkpoint. The batch oracle for every leg is
  * MultimodalQueries.silenceSegments over the same trace.
  */
class VadStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tau = graft.operators.MultimodalQueries.vadTau

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def batchStats(trace: Seq[(Long, Long, Float)]) =
    graft.operators.MultimodalQueries.silenceSegments(
        trace.toDF("media_id", "window", "rms"))
      .collect().map(_.toSeq).toSet

  /** Final stats per clip from the durable append sink: every metric
    * is non-decreasing across a clip's emissions (segments and voiced
    * mass only accumulate; first_voiced_window moves once, off -1),
    * so the per-column max IS the final emission. */
  private def sinkStats(path: String) = {
    import org.apache.spark.sql.functions.max
    spark.read.parquet(path)
      .groupBy($"media_id").agg(max($"n_segments").as("n_segments"),
        max($"voiced_windows").as("voiced_windows"),
        max($"longest_voiced_run").as("longest_voiced_run"),
        max($"first_voiced_window").as("first_voiced_window"))
      .collect().map(_.toSeq).toSet
  }

  test("VAD state continues a voiced run across the batch boundary and survives restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("vad-ckpt"); val out = tmp("vad-out")
    val mem = MemoryStream[(Long, Long, Float)]
    def startEngine() =
      StreamingOps.vadStats(
          mem.toDF().toDF("media_id", "window", "rms")
            .as[StreamingOps.AudioWindow], tau = tau)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    val hi = 30000f; val lo = 100f
    // clip 7: voiced run [2..5] STRADDLES the boundary (2,3 in batch
    // 1; 4,5 in batch 2) — the 4-window longest run exists only if
    // the restart restored prevVoiced/curVoicedRun. clip 8: silence
    // then voiced, entirely in one batch each.
    val b1 = Seq((7L, 0L, lo), (7L, 1L, lo), (7L, 2L, hi), (7L, 3L, hi),
      (8L, 0L, lo), (8L, 1L, lo))
    val b2 = Seq((7L, 4L, hi), (7L, 5L, hi), (7L, 6L, lo),
      (8L, 2L, hi), (8L, 3L, lo))
    mem.addData(b1: _*)
    val q1 = startEngine()
    try q1.processAllAvailable() finally q1.stop()
    assert(sinkStats(out) == batchStats(b1),
      "run 1 diverges from the batch segmentation of batch 1")

    mem.addData(b2: _*)
    val q2 = startEngine()
    try q2.processAllAvailable() finally q2.stop()
    assert(sinkStats(out) == batchStats(b1 ++ b2),
      "restarted VAD diverges from the batch window over the union — " +
        "the straddling run proves prevVoiced/curVoicedRun restored")
    // non-vacuity: clip 7's longest voiced run must span the boundary
    assert(batchStats(b1 ++ b2).exists(r => r.head == 7L && r(3) == 4L),
      "fixture must contain the 4-window straddling run")
  }

  test("late or replayed windows are dropped by the lastWindow guard") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("vad-late-ckpt"); val out = tmp("vad-late-out")
    val mem = MemoryStream[(Long, Long, Float)]
    def startEngine() =
      StreamingOps.vadStats(
          mem.toDF().toDF("media_id", "window", "rms")
            .as[StreamingOps.AudioWindow], tau = tau)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    val hi = 30000f; val lo = 100f
    mem.addData((5L, 0L, lo), (5L, 1L, hi), (5L, 2L, hi))
    val q1 = startEngine()
    try q1.processAllAvailable() finally q1.stop()
    // a replay of window 1 (now silent!) and a late window 0 must not
    // change the stats
    mem.addData((5L, 1L, lo), (5L, 0L, hi))
    val q2 = startEngine()
    try q2.processAllAvailable() finally q2.stop()
    assert(sinkStats(out) ==
      batchStats(Seq((5L, 0L, lo), (5L, 1L, hi), (5L, 2L, hi))),
      "late/replayed windows leaked into the VAD state")
  }
}
