package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class Ev(ts: Timestamp, event_type: String,
    value: Double, user_id: Long)

/** Streaming surface checked against batch equivalents on the same
  * data — the batch operators are themselves DuckDB-oracle-checked, so
  * agreement here transitively validates the streaming forms. */
class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // day-1 offset: an event at exactly epoch 0 equals the initial
  // watermark and is discarded as late by streaming dedup
  private def ts(min: Long): Timestamp =
    new Timestamp(86400000L + min * 60000L)

  private val fixture = Seq(
    Ev(ts(0), "a", 1.5, 1), Ev(ts(10), "a", 2.5, 1),
    Ev(ts(20), "b", 3.0, 2), Ev(ts(65), "a", 4.0, 1),
    Ev(ts(70), "b", 0.5, 2), Ev(ts(130), "a", 1.0, 1),
    Ev(ts(260), "a", 2.0, 1), Ev(ts(265), "b", 7.0, 2))

  test("hourlyAgg (streaming) equals the batch windowed aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(fixture: _*)
    val q = StreamingOps.hourlyAgg(mem.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hourly")
      .select($"hour", $"event_type", $"n", $"total_value")
      .collect().map(_.toSeq).toSet
    val want = fixture.toDF()
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("total_value"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("enrich (stream-static broadcast join) equals the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "name")
    val mem = MemoryStream[Ev]
    mem.addData(fixture: _*)
    val q = StreamingOps.enrich(mem.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("enriched")
      .select($"user_id", $"name", $"value").collect().map(_.toSeq).toSet
    val want = fixture.toDF().join(dim, "user_id")
      .select($"user_id", $"name", $"value").collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("correlate (stream-stream interval join) equals the batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[Ev]
    val memR = MemoryStream[Ev]
    memL.addData(fixture: _*)
    memR.addData(fixture: _*)
    val q = StreamingOps.correlate(
      memL.toDF().select($"ts", $"user_id", $"value".as("lv")),
      memR.toDF().select($"ts", $"user_id", $"value".as("rv")),
      "user_id", windowSec = 900)
      .select(col("l.ts").as("lts"), col("r.ts").as("rts"),
        col("lv"), col("rv"))
      .writeStream.format("memory").queryName("correlated")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("correlated").collect().map(_.toSeq).toSet
    val b = fixture.toDF()
    val want = b.select($"ts".as("lts"), $"user_id", $"value".as("lv"))
      .join(b.select($"ts".as("rts"), $"user_id".as("uid2"), $"value".as("rv")),
        $"user_id" === $"uid2" && $"rts" > $"lts" &&
          $"rts" <= $"lts" + expr("INTERVAL 900 SECONDS"))
      .select($"lts", $"rts", $"lv", $"rv").collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("sessionAgg (streaming session_window) matches gap-based sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(fixture: _*)
    val q = StreamingOps.sessionAgg(mem.toDF())
      .writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sess")
      .select($"user_id", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // user 1 events at minutes 0,10,65,130,260 with 30-min gap:
    // sessions {0,10}, {65}, {130}, {260} → sizes (1,1,1,2)
    assert(got(1L) == Seq(1L, 1L, 1L, 2L))
    // user 2 at 20,70,265 → three singleton sessions
    assert(got(2L) == Seq(1L, 1L, 1L))
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions with monotone ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.TEvt]
    // user 3 has a single early event: its session must be closed by
    // the EVENT-TIME TIMEOUT once the watermark (max ts - lateness =
    // 265min - 60min) passes its last event + gap (10min + 30min)
    val tevts = fixture.map(e => StreamingOps.TEvt(e.user_id, e.ts)) :+
      StreamingOps.TEvt(3L, ts(10))
    mem.addData(tevts: _*)
    val q = StreamingOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("fmgs")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val closed = spark.table("fmgs").as[StreamingOps.Session]
      .collect().sortBy(s => (s.user_id, s.session_id))
    // users 1/2: gap-closed sessions; their trailing sessions (260/265)
    // are still within gap of the watermark and stay open. user 3:
    // closed by timeout.
    assert(closed.map(s => (s.user_id, s.session_id, s.n_events)).toSeq ==
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (1L, 3L, 1L),
          (2L, 1L, 1L), (2L, 2L, 1L), (3L, 1L, 1L)))
    // batch flush helper agrees on the total session count per user
    val evts = fixture.map(e =>
      StreamingOps.Evt(e.user_id, e.ts.getTime * 1000L))
    val all = StreamingOps.openSessions(spark.createDataset(evts))
      .collect().map(s => (s.user_id, s.session_id)).toMap
    assert(all == Map(1L -> 4L, 2L -> 3L))
  }

  test("dedupStream drops exact duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // re-send 3 exact duplicates plus one SAME-CONTENT copy at a
    // different event time — still a duplicate by signature
    mem.addData(fixture ++ fixture.take(3) :+ Ev(ts(5), "a", 1.5, 1): _*)
    val q = StreamingOps.dedupStream(
        mem.toDF().withColumn("sig", md5(concat_ws("|", $"event_type", $"value"))),
        "sig", "ts")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("dedup").count() == fixture.size)
  }

  test("s09 streamed LSH pairs equal the batch d10 pairs on sf0.001") {
    import graft.operators.Catalog
    def rows(name: String) = Catalog.queries(name)(spark, TestSpark.sf0001)
      .select($"id_a", $"id_b", $"n_bands", $"est_jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(rows("s09_stream_lsh_pairs") == rows("d10_minhash_lsh_md5"))
  }

  test("s10 streamed incremental dedup equals batch d34 on sf0.001") {
    import graft.operators.Catalog
    def rows(name: String) = Catalog.queries(name)(spark, TestSpark.sf0001)
      .select($"doc_id", $"sig", $"status", $"keeper")
      .as[(Long, String, String, Long)].collect().toSet
    assert(rows("s10_stream_incremental_dedup") == rows("d34_incremental_dedup"))
  }

  test("s12 streamed K-Means equals the batch m03 loop on sf0.001") {
    import graft.operators.Catalog
    def rows(name: String) = Catalog.queries(name)(spark, TestSpark.sf0001)
      .select($"cid", $"dim", $"mean")
      .as[(Long, Long, Double)].collect().toSet
    assert(rows("s12_stream_kmeans") == rows("m03_kmeans_loop"))
  }

  test("kmeansRefineStream seeds from the first batch and refines per batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Double])]
    val b1 = Seq((0L, Array(0.0, 0.0)), (1L, Array(4.0, 4.0)),
      (2L, Array(0.2, 0.0)), (3L, Array(4.2, 4.0)))
    val b2 = Seq((10L, Array(0.4, 0.2)), (11L, Array(4.4, 4.2)),
      (12L, Array(0.6, 0.2)), (13L, Array(4.6, 4.2)))
    val model = new StreamingOps.StreamingKMeansModel(null)
    mem.addData(b1: _*)
    val pts = mem.toDF().toDF("vec_id", "v")
    val q1 = StreamingOps.kmeansRefineStream(pts, model,
      idCol = "vec_id", seedK = 2, iters = 3)
    q1.awaitTermination()
    assert(model.batches == 1L)
    // batch 1: seeds (0,0)/(4,4) from lowest ids, converges to the
    // two cluster means
    assert(model.centroids.map(_.toSeq).toSeq ==
      Seq(Seq(0.1, 0.0), Seq(4.1, 4.0)))
    mem.addData(b2: _*)
    // AvailableNow terminates per call; a second start (no checkpoint,
    // so the MemoryStream replays everything) REFINES the carried
    // centroids over the union rather than reseeding from lowest ids —
    // the refined means are the 8-point cluster means, which seeding
    // from scratch would also reach here, so the carried-state proof is
    // `batches` advancing without a reseed plus the exact means
    val q2 = StreamingOps.kmeansRefineStream(pts, model,
      idCol = "vec_id", seedK = 2, iters = 3)
    q2.awaitTermination()
    assert(model.batches == 2L)
    assert(model.centroids.map(_.toSeq).toSeq ==
      Seq(Seq(0.3, 0.1), Seq(4.3, 4.1)))
  }

  test("runningStats (update mode) converges to the batch statistics") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(fixture: _*)
    val q = StreamingOps.runningStats(mem.toDF(), "value")
      .writeStream.format("memory").queryName("stats")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val r = spark.table("stats").collect().head
    assert(r.getAs[Long]("cnt") == 8L)
    assert(r.getAs[Double]("vmin") == 0.5)
    assert(r.getAs[Double]("vmax") == 7.0)
    assert(math.abs(r.getAs[Double]("vsum") - 21.5) < 1e-12)
    assert(r.getAs[Double]("positive_min") == 0.5)
  }

  test("kmeansStream moves centroids toward the batch Lloyd step") {
    implicit val sqlCtx = spark.sqlContext
    case class P(v: Array[Double])
    val pts = Seq(
      Array(0.0, 0.0), Array(0.2, 0.1), Array(-0.1, 0.1),
      Array(5.0, 5.0), Array(5.2, 4.9), Array(4.9, 5.1))
    val mem = MemoryStream[Array[Double]]
    mem.addData(pts: _*)
    val init = Array(Array(1.0, 1.0), Array(4.0, 4.0))
    val model = new StreamingOps.StreamingKMeansModel(init.map(_.clone()))
    val q = StreamingOps.kmeansStream(
      mem.toDS().toDF("v"), model, decay = 1.0)
    try q.awaitTermination() finally if (q.isActive) q.stop()

    assert(model.batches >= 1L)
    val expected = graft.ml.KMeans.step(
      spark.createDataset(pts).toDF("v"), init)
    model.centroids.zip(expected).foreach { case (got, want) =>
      got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
    }
  }
}
