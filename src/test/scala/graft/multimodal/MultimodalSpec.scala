package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mediaDf(kind: String = "image", frames: Int = 0) = {
    val docs = Seq(
      (1L, "hello multimodal world"),
      (2L, "a second, longer document with more bytes in it"),
      (3L, "")).toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    Multimodal.ingest(docs, "doc_id", "payload", kind = kind,
      format = "fake", width = 4, height = 3, channels = 3, frames = frames,
      sampleRate = 8000, durationMs = 50)
  }

  test("ingest keeps payload bytes opaque and intact") {
    val rows = mediaDf().collect().sortBy(_.media_id)
    assert(rows.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(new String(rows(0).payload, "UTF-8") == "hello multimodal world")
    assert(rows(2).payload.length == 0)
    assert(rows.forall(r => r.meta.kind == "image" && r.meta.width == 4))
  }

  test("fake decode is deterministic and shape-correct") {
    val m = mediaDf().collect().head
    val t1 = Multimodal.FakeCodec.decodeImage(m.meta, m.payload)
    val t2 = Multimodal.FakeCodec.decodeImage(m.meta, m.payload)
    assert(t1.pixels.toSeq == t2.pixels.toSeq)
    assert(t1.pixels.length == 4 * 3 * 3)
  }

  test("imageFeatures: 2C dims, batch path matches direct kernel") {
    val feats = Multimodal.imageFeatures(mediaDf()).collect()
      .map(r => r.getAs[Long]("media_id") ->
        r.getAs[scala.collection.Seq[Float]]("features")).toMap
    assert(feats.size == 3)
    assert(feats.values.forall(_.size == 6)) // 2 * channels
    // direct kernel recompute for media 1
    val m = mediaDf().collect().find(_.media_id == 1L).get
    val t = Multimodal.FakeCodec.decodeImage(m.meta, m.payload)
    val c0 = t.pixels.indices.filter(_ % 3 == 0).map(i => (t.pixels(i) & 0xff).toDouble)
    val mean = c0.sum / c0.size
    assert(math.abs(feats(1L)(0) - mean) < 1e-3)
  }

  test("resize: nearest-neighbor shape and determinism") {
    val out = Multimodal.resize(mediaDf(), outW = 8, outH = 6).collect()
    assert(out.forall(t => t.pixels.length == 8 * 6 * 3))
    // upscale of a constant-ish source keeps byte values from the source
    val src = Multimodal.FakeCodec.decodeImage(
      mediaDf().collect().head.meta, mediaDf().collect().head.payload)
    val up = out.find(_.media_id == 1L).get
    assert(up.pixels.toSet.subsetOf(src.pixels.toSet))
  }

  test("sampleFrames: stride selects ceil(frames/stride) frames per video") {
    val df = Multimodal.sampleFrames(mediaDf(kind = "video", frames = 10), stride = 3)
    val counts = df.groupBy($"media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 4)) // frames 0,3,6,9
    val frames = df.where($"media_id" === 1L).select($"frame")
      .as[Int].collect().sorted
    assert(frames.toSeq == Seq(0, 3, 6, 9))
  }

  test("media dedup by feature signature collapses identical payloads") {
    import org.apache.spark.sql.functions.xxhash64
    // inject explicit duplicates: ids 1 and 10 share a payload
    val docs = Seq(
      (1L, "same payload bytes"), (2L, "unique one"),
      (3L, "unique two"), (10L, "same payload bytes"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val m = Multimodal.ingest(docs, "doc_id", "payload", kind = "image",
      format = "fake", width = 16, height = 16, channels = 3)
    val groups = Multimodal.imageFeatures(m)
      .groupBy(xxhash64($"features").as("sig"))
      .agg(org.apache.spark.sql.functions.min($"media_id").as("keeper"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("keeper") -> r.getAs[Long]("n"))
    assert(groups.length == 3) // 4 media -> 3 distinct contents
    assert(groups.contains(1L -> 2L)) // dup group kept the lowest id
    assert(groups.map(_._2).sum == 4)
    // the registered x04 runs clean over the real fixture
    import graft.TestSpark
    val q = graft.operators.MultimodalQueries.all
      .find(_.name == "x04_media_dedup").get
    val out = q.fn(spark, TestSpark.sf0001)
    assert(out.agg(org.apache.spark.sql.functions.sum($"n_copies"))
      .head().getLong(0) ==
      spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet").count())
  }

  test("audioFeatures: windows cover all samples, rms/zcr in range") {
    val df = Multimodal.audioFeatures(mediaDf(kind = "audio"), windowSamples = 100)
    val rows = df.where($"media_id" === 1L).collect()
    // 8000 Hz * 50 ms = 400 samples -> 4 windows of 100
    assert(rows.length == 4)
    assert(rows.forall { r =>
      val zcr = r.getAs[Double]("zcr")
      zcr >= 0.0 && zcr <= 1.0 && r.getAs[Float]("rms") >= 0f
    })
  }
}
