package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The s39 engine's cross-batch contract: a click→purchase pair that
  * STRADDLES a micro-batch boundary only attributes through the
  * restored last-click state, the attribution window actually
  * expires, the state survives a kill/restart from the checkpoint,
  * and replayed events are dropped by the cursor guard. Expected
  * values are hand-derived from the attribution semantics — the same
  * contract q43's SQL oracle gates at the fixture.
  */
class AttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val win = 3600000000L // 1 hour in micros

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  /** Final rollup per user from the durable append sink: purchases,
    * attributions, and cents only accumulate, so the per-column max
    * is the final emission. */
  private def sinkStats(path: String) = {
    import org.apache.spark.sql.functions.max
    spark.read.parquet(path)
      .groupBy($"user_id").agg(max($"n_purchases").as("n_purchases"),
        max($"n_attributed").as("n_attributed"),
        max($"attr_value_cents").as("attr_value_cents"))
      .collect().map(_.toSeq).toSet
  }

  private def startEngine(mem: MemoryStream[(Long, Long, Long, Boolean,
      Boolean, Long)], out: String, ckpt: String) =
    StreamingOps.attributionStats(
        mem.toDF().toDF("user_id", "us", "event_id", "is_click",
          "is_purchase", "cents")
          .as[StreamingOps.AttrEvent], win)
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

  test("a click->purchase pair straddling the boundary attributes after restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("attr-ckpt"); val out = tmp("attr-out")
    val mem = MemoryStream[(Long, Long, Long, Boolean, Boolean, Long)]
    // user 1: click in batch 1; purchase in batch 2 inside the window
    // (attributes only via restored lastClickUs), then a purchase
    // past the window (must NOT attribute). user 2: purchase with no
    // prior click — emitted unattributed from batch 1.
    val b1 = Seq((1L, 100L, 1L, true, false, 0L),
      (2L, 50L, 2L, false, true, 700L))
    val b2 = Seq((1L, 200L, 3L, false, true, 500L),
      (1L, 100L + win + 1L, 4L, false, true, 900L))
    mem.addData(b1: _*)
    val q1 = startEngine(mem, out, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    assert(sinkStats(out) == Set(Seq(2L, 1L, 0L, 0L)),
      "run 1: only user 2's unattributed purchase should emit")

    mem.addData(b2: _*)
    val q2 = startEngine(mem, out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(sinkStats(out) ==
      Set(Seq(1L, 2L, 1L, 500L), Seq(2L, 1L, 0L, 0L)),
      "restarted attribution diverges — the boundary pair proves " +
        "lastClickUs state restored, and the late purchase proves the " +
        "window expires")
  }

  test("replayed purchases are dropped by the cursor guard") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("attr-late-ckpt"); val out = tmp("attr-late-out")
    val mem = MemoryStream[(Long, Long, Long, Boolean, Boolean, Long)]
    val b1 = Seq((3L, 10L, 1L, true, false, 0L),
      (3L, 20L, 2L, false, true, 100L))
    // batch 2 replays the purchase (must drop) then adds a real one
    val b2 = Seq((3L, 20L, 2L, false, true, 100L),
      (3L, 30L, 3L, false, true, 200L))
    mem.addData(b1: _*)
    val q1 = startEngine(mem, out, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    mem.addData(b2: _*)
    val q2 = startEngine(mem, out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(sinkStats(out) == Set(Seq(3L, 2L, 2L, 300L)),
      "replayed purchase double-counted — the (us, event_id) guard failed")
  }
}
