package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The s30 engine's cross-batch contract, which the single-batch
  * driver fixture can't exercise: per-media O(1) scene state folds
  * frames arriving over MANY micro-batches (a cut that straddles a
  * batch boundary is only visible through the restored prevMean), and
  * the state survives a kill/restart from the checkpoint. The batch
  * oracle for every leg is MultimodalQueries.sceneSegments over the
  * same trace.
  */
class SceneStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def batchStats(trace: Seq[StreamingOps.FrameMean]) =
    graft.operators.MultimodalQueries.sceneSegments(
        trace.toDF("media_id", "frame", "mean_intensity"))
      .collect().map(_.toSeq).toSet

  /** Final stats per media from the durable append sink. Every metric
    * is non-decreasing across a media's emissions (cuts and runs only
    * accumulate; first_cut moves once, off -1), so the per-column max
    * IS the final emission — no reliance on sink row order. */
  private def sinkStats(path: String) = {
    import org.apache.spark.sql.functions.max
    spark.read.parquet(path)
      .groupBy($"media_id").agg(max($"n_scenes").as("n_scenes"),
        max($"longest_scene_frames").as("longest_scene_frames"),
        max($"first_cut").as("first_cut"))
      .collect().map(_.toSeq).toSet
  }

  test("scene state folds a cut across the batch boundary and survives restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("scene-ckpt"); val out = tmp("scene-out")
    val mem = MemoryStream[(Long, Int, Double)]
    def startEngine() =
      StreamingOps.sceneStats(
          mem.toDF().toDF("media_id", "frame", "mean")
            .as[StreamingOps.FrameMean], tau = 10.0)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // media 7: flat 20s for frames 0..3, jump to 90s at frame 4 — but
    // the jump frame arrives in BATCH 2, so the cut exists only if the
    // restored state still holds frame 3's mean. media 8: flat, no cut.
    val b1 = Seq((7L, 0, 20.0), (7L, 1, 21.0), (7L, 2, 20.5), (7L, 3, 20.0),
      (8L, 0, 50.0), (8L, 1, 51.0))
    val b2 = Seq((7L, 4, 90.0), (7L, 5, 91.0), (7L, 6, 90.5),
      (8L, 2, 52.0), (8L, 3, 50.0))
    mem.addData(b1.map { case (m, f, x) => (m, f, x) }: _*)
    val q1 = startEngine()
    try q1.processAllAvailable() finally q1.stop()
    assert(sinkStats(out) ==
      batchStats(b1.map(t => StreamingOps.FrameMean(t._1, t._2, t._3))),
      "run 1 diverges from the batch segmentation of batch 1")

    mem.addData(b2.map { case (m, f, x) => (m, f, x) }: _*)
    val q2 = startEngine()
    try q2.processAllAvailable() finally q2.stop()
    val full = (b1 ++ b2).map(t => StreamingOps.FrameMean(t._1, t._2, t._3))
    assert(sinkStats(out) == batchStats(full),
      "restarted segmentation diverges from the batch window over the " +
        "union — the boundary cut proves prevMean state restored")
    // non-vacuity: the boundary cut must exist (media 7 has 2 scenes)
    assert(batchStats(full).exists(r => r.head == 7L && r(1) == 2L))
  }

  test("late or replayed frames are dropped by the lastFrame guard") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("scene-late-ckpt"); val out = tmp("scene-late-out")
    val mem = MemoryStream[(Long, Int, Double)]
    def startEngine() =
      StreamingOps.sceneStats(
          mem.toDF().toDF("media_id", "frame", "mean")
            .as[StreamingOps.FrameMean], tau = 10.0)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    mem.addData((1L, 0, 10.0), (1L, 1, 11.0), (1L, 2, 80.0))
    val q1 = startEngine()
    try q1.processAllAvailable() finally q1.stop()
    // frame 1 re-arrives with a wildly different mean: a fold of the
    // replay would fabricate cuts; the guard must ignore it
    mem.addData((1L, 1, 300.0))
    val q2 = startEngine()
    try q2.processAllAvailable() finally q2.stop()
    val want = batchStats(Seq(StreamingOps.FrameMean(1L, 0, 10.0),
      StreamingOps.FrameMean(1L, 1, 11.0), StreamingOps.FrameMean(1L, 2, 80.0)))
    assert(sinkStats(out) == want,
      s"replayed frame altered the segmentation: ${sinkStats(out)} vs $want")
  }
}
