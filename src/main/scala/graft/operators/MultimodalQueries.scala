package graft.operators

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries over the `documents` fixture. The corpus
  * has no real media files, so the payload is the document's UTF-8
  * bytes treated as an opaque binary column — which is precisely the
  * point: the engine never interprets payload bytes, so the plumbing
  * (binary columns, typed metadata, batch kernels) is identical for
  * real images/audio. Decode goes through Multimodal.FakeCodec (a
  * clearly-marked deterministic stub).
  */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String) = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    Multimodal.ingest(docs, "doc_id", "payload", kind = "image",
      format = "fake", width = 16, height = 16, channels = 3)
  }

  /** x01: binary ingest — exact oracle on the opaque-byte invariants
    * (length and md5 of the payload). Proves binary columns survive the
    * scan → ingest → projection path byte-for-byte.
    */
  private def x01(s: SparkSession, dir: String): DataFrame =
    media(s, dir).toDF()
      .select(col("media_id").as("doc_id"),
        octet_length(col("payload")).cast("long").as("payload_len"),
        md5(col("payload")).as("payload_md5"))

  private val x01Sql =
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
      |       md5(text) AS payload_md5
      |FROM documents""".stripMargin

  /** x02: decode + per-channel image features. The stub decode's hash
    * stream is not SQL-expressible, but it IS per-record deterministic,
    * so the oracle is a pinned golden table (GoldenOracles.x02) that
    * was cross-checked against an independent non-JVM reimplementation
    * of the codec + feature math. Kernel invariants also in
    * MultimodalSpec.
    */
  private def x02(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageFeatures(media(s, dir))
      .select(col("media_id"), size(col("features")).as("dim"),
        round(element_at(col("features"), 1), 4).as("mean_c0"))

  /** x03: frame sampling over the same payloads declared as video.
    * The rollup depends only on the declared metadata, not on decoded
    * pixels — every doc yields ceil(frames/stride) = 3 frames of
    * 8·8·3 = 192 bytes — so the oracle is real SQL over documents.
    */
  private def x03(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val vids = Multimodal.ingest(docs, "doc_id", "payload", kind = "video",
      format = "fake", width = 8, height = 8, channels = 3, frames = 12)
    Multimodal.sampleFrames(vids, stride = 4)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("width") * col("height") * col("channels")).as("bytes"))
  }

  /** x04: content-addressable media dedup — decode → feature-extract →
    * group by the exact feature signature. Identical payloads decode to
    * identical features, so copies collapse to one keeper regardless of
    * their ids; the signature groupBy is the only shuffle (the d01
    * exact-dedup shape applied to media).
    */
  private def x04(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageFeatures(media(s, dir))
      .groupBy(xxhash64(col("features")).as("feat_sig"))
      .agg(min(col("media_id")).as("keeper"),
        count(lit(1)).as("n_copies"))

  /** x05: audio decode + windowed RMS / zero-crossing features over the
    * payloads declared as audio (pinned-golden gated like x02, with the
    * same independent cross-check; kernel invariants in
    * MultimodalSpec). One mapPartitions pass, window rows flatMapped
    * out, per-media rollup is the only shuffle.
    */
  private def x05(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val auds = Multimodal.ingest(docs, "doc_id", "payload", kind = "audio",
      format = "fake", sampleRate = 8000, durationMs = 250) // 2000 samples
    Multimodal.audioFeatures(auds, windowSamples = 500)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_windows"),
        round(avg(col("rms")), 3).as("avg_rms"),
        round(avg(col("zcr")), 6).as("avg_zcr"))
  }

  private val x03Sql =
    """SELECT doc_id AS media_id,
      |  CAST(3 AS BIGINT) AS n_frames,
      |  CAST(3 * 8 * 8 * 3 AS BIGINT) AS bytes
      |FROM documents""".stripMargin

  val all: Seq[Q] = Seq(
    Q("x01_media_ingest", x01, Some(x01Sql)),
    Q("x02_image_features", x02, Some(GoldenOracles.x02)),
    Q("x03_frame_sample", x03, Some(x03Sql)),
    Q("x04_media_dedup", x04, Some(GoldenOracles.x04)),
    Q("x05_audio_features", x05, Some(GoldenOracles.x05)))
}
