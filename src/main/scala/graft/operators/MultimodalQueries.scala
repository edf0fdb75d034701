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

  private def media(s: SparkSession, dir: String) = mediaOf(s, dir)

  private[operators] def mediaOf(s: SparkSession, dir: String) = {
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

  /** x06: fixed-block content-addressable dedup audit — the storage
    * dedup a 100 TB media lake runs before anything decodes. Payloads
    * are cut into fixed B-byte blocks (byte substrings; the bytes stay
    * opaque), keyed by md5, and the GLOBAL first occurrence (lowest
    * (media_id, block_idx), BIGINT-encoded) keeps each block — the
    * per-media audit reports duplicate blocks and reclaimable bytes.
    * d25's explode → key-agg → key-join shape applied to binary.
    * B = 16 so the fixture's 31-word payload soup yields real
    * collisions (712 dup blocks at sf0.01 — the non-vacuous-oracle
    * rule); production stores use 4–64 KiB blocks, same plan. The
    * DuckDB mirror substrings the VARCHAR text (fixture payloads are
    * ASCII at every SF, so char offsets ARE byte offsets — the x01
    * md5(text) ≡ md5(bytes) equivalence this oracle family rests on).
    * Fixed blocks are alignment-sensitive; the shift-robust CDC
    * variant is x07.
    */
  private val x06B = 16

  /** The fixed-block struct array expression x06 and x08 both cut
    * payloads with — one definition of "a block" for the whole
    * block-dedup family (Scala side; the SQL mirror is
    * `blockExSqlCtes`). */
  private val blockStructsExpr =
    s"""transform(sequence(0, cast(ceil(octet_length(payload) / $x06B.0) as int) - 1),
       |  i -> struct(md5(substring(payload, i * $x06B + 1, $x06B)) as h,
       |    cast(octet_length(substring(payload, i * $x06B + 1, $x06B)) as bigint) as blen))"""
      .stripMargin

  /** The shared DuckDB `ex`/`bl` CTE text cutting documents into the
    * same fixed blocks (the ASCII char≡byte offset contract from x01). */
  private val blockExSqlCtes =
    s"""ex AS (SELECT doc_id AS media_id, text,
       |    unnest(generate_series(0,
       |      CAST(ceil(length(text) / $x06B.0) AS INT) - 1)) AS bi
       |  FROM documents WHERE length(text) > 0),
       |bl AS (SELECT media_id, bi,
       |    md5(substring(text, bi * $x06B + 1, $x06B)) AS h,
       |    CAST(length(substring(text, bi * $x06B + 1, $x06B)) AS BIGINT)
       |      AS blen
       |  FROM ex)""".stripMargin

  /** (media_id, bi, h, blen) block rows — a stateless projection +
    * explode over any (media_id, payload) frame, batch or stream. */
  private[operators] def blockRows(m: DataFrame): DataFrame =
    m.filter(octet_length(col("payload")) > 0)
      .select(col("media_id"),
        posexplode(expr(blockStructsExpr)).as(Seq("bi", "b")))
      .select(col("media_id"), col("bi"), col("b.h").as("h"),
        col("b.blen").as("blen"))

  /** The global block keeper ledger — the static side a streaming
    * dedup-on-arrival probes (s25), built once per dataset. */
  private[operators] def blockKeeperLedger(s: SparkSession, dir: String)
      : DataFrame =
    blockRows(media(s, dir).toDF()).groupBy(col("h"))
      .agg(min(col("media_id") * 1000000L + col("bi")).as("keeper"))

  /** Per-media dup-block audit over keeper-joined block rows — the
    * rollup tail shared by batch x06 and the streamed s25 sink. */
  private[operators] def blockAudit(joined: DataFrame): DataFrame =
    joined.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("media_id") * 1000000L + col("bi") =!= col("keeper"), 1L)
          .otherwise(0L)).as("n_dup_blocks"),
        sum(when(col("media_id") * 1000000L + col("bi") =!= col("keeper"),
          col("blen")).otherwise(0L)).as("dup_bytes"))

  /** Block rows probing the keeper ledger — the equi-join shared by
    * batch x06 and the streamed s25. Deliberately NO broadcast hint:
    * the ledger is one row per distinct block hash, i.e. corpus-
    * proportional, so the probe must stay free to plan as a shuffled
    * join at scale (a stream-static inner equi-join is stateless and
    * shuffle-joinable). PlanDisciplineSpec asserts no
    * BroadcastExchange sits over the ledger aggregate. */
  private[operators] def ledgerProbe(blocks: DataFrame, ledger: DataFrame)
      : DataFrame =
    blocks.join(ledger, "h")

  private def x06(s: SparkSession, dir: String): DataFrame = {
    val bl = blockRows(media(s, dir).toDF())
    blockAudit(ledgerProbe(bl, blockKeeperLedger(s, dir)))
  }
  // composed by concatenation: stripMargin over the interpolated CTE
  // block would strip its inner margins twice
  private[operators] val x06Sql =
    s"WITH $blockExSqlCtes,\n" +
      """k AS (SELECT h, min(media_id * 1000000 + bi) AS keeper
        |  FROM bl GROUP BY 1),
        |j AS (SELECT bl.media_id, bl.bi, bl.blen, k.keeper
        |  FROM bl JOIN k USING (h))
        |SELECT media_id, CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(sum(CASE WHEN media_id * 1000000 + bi <> keeper
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_blocks,
        |  CAST(sum(CASE WHEN media_id * 1000000 + bi <> keeper
        |    THEN blen ELSE 0 END) AS BIGINT) AS dup_bytes
        |FROM j GROUP BY media_id""".stripMargin

  /** x07: content-defined (Gear-hash) chunking audit — the
    * shift-robust sibling of x06: boundaries are a function of the
    * BYTES (rolling gear hash masks to zero), so shared content
    * chunks identically at any offset. One mapPartitions pass, chunk
    * rows emitted in place; the per-media rollup (chunk count, bytes,
    * and an order-sensitive FNV fold of the chunk hashes) is the only
    * shuffle. The rolling-hash stream is per-record deterministic but
    * not SQL-expressible, so the oracle is a pinned golden
    * (GoldenOracles.x07, cross-checked against an independent non-JVM
    * reimplementation of gear + FNV before pinning — the x02 rule);
    * chunking invariants (exact tiling, size bounds, determinism,
    * shifted-payload resync vs fixed blocks) are in MultimodalSpec.
    */
  private val x07Min = 16
  private val x07Max = 64
  private val x07MaskBits = 5
  private def x07(s: SparkSession, dir: String): DataFrame = {
    // chunking is per-record, so the whole per-media audit folds inside
    // the same partition pass — ZERO shuffles (ANSI SQL would also
    // reject the wrap-around FNV multiply; in the kernel i64 wrap is
    // the defined semantics). chunks_sig is an order-sensitive FNV-1a
    // fold over the chunk-hash sequence: it pins boundaries AND order,
    // not just the stats.
    val m = media(s, dir)
    val sp = m.sparkSession
    import sp.implicits._
    m.mapPartitions { it =>
      it.map { r =>
        val bs = Multimodal.cdcBoundaries(r.payload, x07Min, x07Max, x07MaskBits)
        var sig = 0xcbf29ce484222325L
        var total = 0L
        var mn = Long.MaxValue
        var mx = Long.MinValue
        bs.foreach { case (off, len) =>
          sig = (sig ^ Multimodal.fnv64(r.payload, off, len)) * 0x100000001b3L
          total += len
          mn = math.min(mn, len); mx = math.max(mx, len)
        }
        (r.media_id, bs.length.toLong, total, mn, mx, sig)
      }
    }.toDF("media_id", "n_chunks", "total_bytes", "min_len", "max_len",
      "chunks_sig")
  }

  /** x08: media near-dup pairs by shared content blocks — the
    * between-media sibling of x06's within-store audit: two payloads
    * sharing ≥ 2 distinct 16-byte blocks are near-dup candidates,
    * scored by block-set Jaccard. Scale discipline is d05/d18's:
    * the self-join keys on the block hash (ids only), and BOILERPLATE
    * blocks — hash df > `x08MaxDf` medias — are pruned from pairing
    * first (the stopword rule for content blocks), so a block shared
    * by everything cannot quadratically pair the corpus. The score is
    * named `pruned_jaccard` because it is NOT block-set Jaccard: the
    * numerator counts only pruned shared blocks (2 ≤ df ≤ `x08MaxDf`)
    * while the denominator uses full distinct-block set sizes, so
    * pairs sharing high-df blocks score below the textbook metric —
    * deliberate (boilerplate must not certify similarity), and the
    * oracle mirrors it exactly. 6dp rounding is
    * the floor form (small-integer ratios hit round() half-cases).
    * Production swaps the aligned blocks for x07's CDC chunks (shift-
    * robust) — same plan from the hash column on.
    */
  private val x08MaxDf = 50
  private def x08(s: SparkSession, dir: String): DataFrame = {
    val bl = media(s, dir).toDF()
      .filter(octet_length(col("payload")) > 0)
      .select(col("media_id"), explode(expr(
        s"array_distinct(transform($blockStructsExpr, b -> b.h))")).as("h"))
    val shareable = bl.groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= x08MaxDf)
      .select(col("h"))
    val shared = bl.join(shareable, "h")
    val pairs = shared.as("x").join(shared.as("y"),
        col("x.h") === col("y.h") && col("x.media_id") < col("y.media_id"))
      .groupBy(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    val sizes = bl.groupBy(col("media_id")).agg(count(lit(1)).as("n"))
    pairs
      .join(sizes.select(col("media_id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("media_id").as("id_b"), col("n").as("nb")), "id_b")
      .filter(col("common") >= 2)
      .select(col("id_a"), col("id_b"), col("common"),
        (floor(col("common") / (col("na") + col("nb") - col("common"))
          * 1e6 + 0.5) / 1e6).as("pruned_jaccard"))
  }
  private val x08Sql =
    s"WITH $blockExSqlCtes,\n" +
      s"""bd AS (SELECT DISTINCT media_id, h FROM bl),
         |sh AS (SELECT h FROM bd GROUP BY h
         |  HAVING COUNT(*) >= 2 AND COUNT(*) <= $x08MaxDf),
         |s2 AS (SELECT bd.media_id, bd.h FROM bd JOIN sh USING (h)),
         |pairs AS (SELECT x.media_id AS id_a, y.media_id AS id_b,
         |    COUNT(*) AS common
         |  FROM s2 x JOIN s2 y ON x.h = y.h AND x.media_id < y.media_id
         |  GROUP BY 1, 2),
         |sz AS (SELECT media_id, COUNT(*) AS n FROM bd GROUP BY 1)
         |SELECT p.id_a, p.id_b, p.common,
         |  floor(CAST(p.common AS DOUBLE) / (sa.n + sb.n - p.common)
         |    * 1e6 + 0.5) / 1e6 AS pruned_jaccard
         |FROM pairs p JOIN sz sa ON p.id_a = sa.media_id
         |JOIN sz sb ON p.id_b = sb.media_id
         |WHERE p.common >= 2""".stripMargin

  // ---- x09: modality-coverage manifest ----
  // The readiness audit run BEFORE any semantic-curation stage: which
  // documents actually have every modality attached? A doc without an
  // embedding is invisible to the whole v-family (dedup, diversity,
  // hard negatives) and silently survives semantic pruning — at sf0.1
  // the fixture embeds only 2000 of 5000 docs, so the gap is real, not
  // synthetic. Per (source) cell: doc counts, embedding coverage, the
  // blank-text count (unembeddable, un-tokenizable), and the TOKEN
  // MASS still awaiting embedding — the backlog an embedding fleet
  // has to burn down, which is the number a pipeline owner budgets by.
  // Scale shape: corpus equi-join on the shared id (both sides
  // id-keyed), one codegen'd token-count projection, and a BOUNDED
  // per-source hash agg with partials. Coverage is a floor-snapped
  // ratio of exact integers.
  /** The x09 coverage aggregation over any (doc_id, source, text)
    * frame — batch scan or readStream alike (s19 lifts it onto a
    * document stream with the embeddings side static). */
  private[operators] def coverageAgg(docsRaw: DataFrame,
      emb: DataFrame): DataFrame = {
    val docs = docsRaw
      .select(col("doc_id"), col("source"),
        (length(trim(col("text"))) === 0).cast("long").as("blank"),
        when(length(trim(col("text"))) === 0, 0L)
          .otherwise(size(graft.text.TextOps.tokensOnce(col("text"))).cast("long"))
          .as("n_tokens"))
    docs.join(emb, col("doc_id") === col("vec_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("has_emb"), lit(0L))).as("n_embedded"),
        sum(col("blank")).as("n_blank"),
        sum(when(col("has_emb").isNull, col("n_tokens")).otherwise(0L))
          .as("backlog_tokens"))
      .select(col("source"), col("n_docs"), col("n_embedded"),
        col("n_blank"), col("backlog_tokens"),
        (floor(col("n_embedded") / col("n_docs") * 1e6 + 0.5) / 1e6)
          .as("coverage"))
  }

  private[operators] def embFlags(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "embeddings").select($"vec_id", lit(1L).as("has_emb"))
  }

  private def x09(s: SparkSession, dir: String): DataFrame =
    coverageAgg(Tables(s, dir, "documents"), embFlags(s, dir))
  private[operators] val x09Sql =
    """WITH d AS (SELECT doc_id, source,
      |    CAST(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END AS BIGINT)
      |      AS blank,
      |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |      ELSE len(string_split(lower(trim(
      |        regexp_replace(text, '\s+', ' ', 'g'))), ' ')) END AS BIGINT)
      |      AS n_tokens
      |  FROM documents),
      |j AS (SELECT d.*, e.vec_id FROM d
      |      LEFT JOIN embeddings e ON d.doc_id = e.vec_id),
      |g AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(CASE WHEN vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_embedded,
      |    CAST(SUM(blank) AS BIGINT) AS n_blank,
      |    CAST(SUM(CASE WHEN vec_id IS NULL THEN n_tokens ELSE 0 END)
      |      AS BIGINT) AS backlog_tokens
      |  FROM j GROUP BY 1)
      |SELECT source, n_docs, n_embedded, n_blank, backlog_tokens,
      |  floor(n_embedded / n_docs * 1e6 + 0.5) / 1e6 AS coverage
      |FROM g""".stripMargin

  // ---- x10: CDC dedup-efficiency curve over chunk-size dials ----
  // The storage-tuning audit a dedup store runs before fixing its
  // chunking dial: smaller average chunks find more duplicate mass but
  // cost more index entries — the classic CDC size/ratio trade. For
  // maskBits ∈ {4, 5, 6} (expected chunk ≈ 2^mask bytes; min/max
  // scaled with the mask so forced cuts don't swamp the content-
  // defined ones), ONE mapPartitions pass chunks every payload at all
  // three dials (chunking is per-record — no shuffle), and the only
  // exchange carries (mask, hash, len) chunk rows into the
  // content-address rollup: per dial, chunk/distinct counts, duplicate
  // bytes (Σ (copies−1)·len over addresses), and the ppm dedup ratio —
  // integer floor-div of exact sums. The dial curve pattern (m06/d56/
  // v25) applied to the multimodal store. Oracle: pinned golden (gear
  // hashing and wrap-around FNV are not ANSI-expressible — the x07
  // precedent), partition-invariance re-proven at sf0.1 by the sweep.
  private val x10Masks = Seq(4, 5, 6)
  private def x10(s: SparkSession, dir: String): DataFrame = {
    val m = media(s, dir)
    val sp = m.sparkSession
    import sp.implicits._
    val chunks = m.mapPartitions { it =>
      it.flatMap { r =>
        x10Masks.iterator.flatMap { mb =>
          val minSize = 1 << (mb - 1); val maxSize = 4 << mb
          Multimodal.cdcBoundaries(r.payload, minSize, maxSize, mb)
            .iterator.map { case (off, len) =>
              (mb.toLong, Multimodal.fnv64(r.payload, off, len), len.toLong)
            }
        }
      }
    }.toDF("mask_bits", "hash", "len")
    chunks
      .groupBy($"mask_bits", $"hash", $"len")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"mask_bits")
      .agg(sum($"cnt").as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum($"cnt" * $"len").as("total_bytes"),
        sum(($"cnt" - 1L) * $"len").as("dup_bytes"))
      .select($"mask_bits", $"n_chunks", $"n_distinct", $"total_bytes",
        $"dup_bytes",
        expr("dup_bytes * 1000000 div total_bytes").as("dedup_ppm"))
  }

  // ---- x11: shot/scene segmentation over frame-intensity change-points ----
  // The video-curation primitive between x03's frame sampling and a
  // real scene encoder: per-frame mean intensity (one decode+reduce
  // partition pass — pixels never leave the task, see
  // Multimodal.frameMeans), then a cut wherever the intensity jumps
  // more than `sceneTau` between consecutive frames (the classic
  // pixel/histogram-difference shot detector), then scenes as the
  // running cut count. Scale shape: the Window and both aggs are keyed
  // by media_id — per-video state is `frames` rows, the corpus-wide
  // exchange carries 3 scalars per frame, and nothing is driver-side.
  // With a real codec only frameMeans changes (histogram distance,
  // embedding cosine); the segmentation tail is codec-agnostic and is
  // unit-proven against a synthetic two-scene codec in MultimodalSpec.
  // Oracle: pinned golden (FakeCodec streams aren't SQL-expressible;
  // cross-checked against an independent reimplementation of the
  // codec + trace math outside the JVM, the x02/x05 discipline).
  private[operators] val sceneTau = 10.0
  private val sceneFrames = 12

  /** The documents fixture as fake 8×8×3 12-frame videos — shared by
    * x11 and its streaming leg (the source side works on a batch scan
    * or a readStream unchanged). */
  private[operators] def videoMedia(docs: DataFrame)
      : org.apache.spark.sql.Dataset[graft.multimodal.Multimodal.MediaRecord] =
    Multimodal.ingest(docs, "doc_id", "payload", kind = "video",
      format = "fake", width = 8, height = 8, channels = 3,
      frames = sceneFrames)

  /** The codec-agnostic segmentation tail: (media_id, frame,
    * mean_intensity) → one row per media with scene stats. */
  private[graft] def sceneSegments(means: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame"))
    val cuts = means
      .withColumn("prev", lag(col("mean_intensity"), 1).over(w))
      .withColumn("cut",
        when(col("prev").isNotNull &&
          abs(col("mean_intensity") - col("prev")) > sceneTau, 1L)
          .otherwise(0L))
      .withColumn("scene", sum(col("cut")).over(w))
    cuts
      .groupBy(col("media_id"), col("scene"))
      .agg(count(lit(1)).as("len"), min(col("frame")).as("start_frame"))
      .groupBy(col("media_id"))
      .agg((max(col("scene")) + 1L).cast("long").as("n_scenes"),
        max(col("len")).cast("long").as("longest_scene_frames"),
        coalesce(min(when(col("scene") === 1L, col("start_frame"))),
          lit(-1L)).cast("long").as("first_cut"))
  }

  private def x11(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    sceneSegments(Multimodal.frameMeans(videoMedia(docs)))
  }

  // ---- x13: audio silence/speech segmentation (energy VAD) ----
  // The audio-curation primitive next to x11's video scenes: per-window
  // RMS energy (x05's one-pass decode kernel at a finer window) split
  // into voiced/silent by an energy threshold — the classic
  // energy-gate VAD — then consecutive same-state windows merged into
  // runs and rolled up per clip (segment count, voiced mass, longest
  // voiced run, first voiced window). Speech-heavy clips route to
  // transcription; silence-dominated ones are padding a curation run
  // drops before paying for ASR. Scale shape: the Window and aggs are
  // keyed by media_id (per-clip state = `windows` rows — the x11
  // segmentation discipline), the corpus exchange carries 3 scalars
  // per window, nothing driver-side. The threshold sits at the
  // fixture's median window RMS so the stub codec's hash-noise
  // exercises the full run machinery; a real codec changes only
  // decodeAudio (MultimodalSpec proves the tail on synthetic
  // two-state audio with known runs). Oracle: pinned golden (the
  // x02/x05/x11 premise — per-record deterministic decode,
  // partition-invariant, cross-checked out-of-JVM at pinning time).
  private[graft] val vadTau = 18820.0
  private[operators] val vadWindow = 100

  /** The documents fixture as fake 8 kHz / 250 ms audio clips —
    * shared by x05-style feature passes and x13 (works over a batch
    * scan or a readStream unchanged). */
  private[operators] def audioMedia(docs: DataFrame)
      : org.apache.spark.sql.Dataset[graft.multimodal.Multimodal.MediaRecord] =
    Multimodal.ingest(docs, "doc_id", "payload", kind = "audio",
      format = "fake", sampleRate = 8000, durationMs = 250)

  /** The codec-agnostic VAD tail: (media_id, window, rms) → one row
    * per clip with voiced/silence run stats. */
  private[graft] def silenceSegments(feat: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("media_id")).orderBy(col("window"))
    val st = feat
      .withColumn("voiced", (col("rms") >= vadTau).cast("long"))
      .withColumn("prev", lag(col("voiced"), 1).over(w))
      .withColumn("cut",
        when(col("prev").isNotNull && col("voiced") =!= col("prev"), 1L)
          .otherwise(0L))
      .withColumn("seg", sum(col("cut")).over(w))
    st
      .groupBy(col("media_id"), col("seg"), col("voiced"))
      .agg(count(lit(1)).as("len"), min(col("window")).as("start"))
      .groupBy(col("media_id"))
      .agg((max(col("seg")) + 1L).cast("long").as("n_segments"),
        sum(when(col("voiced") === 1L, col("len")).otherwise(0L))
          .cast("long").as("voiced_windows"),
        coalesce(max(when(col("voiced") === 1L, col("len"))), lit(0L))
          .cast("long").as("longest_voiced_run"),
        coalesce(min(when(col("voiced") === 1L, col("start"))), lit(-1L))
          .cast("long").as("first_voiced_window"))
  }

  private def x13(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    silenceSegments(
      Multimodal.audioFeatures(audioMedia(docs), windowSamples = vadWindow))
  }

  // ---- x12: perceptual-hash near-dup (aHash + Hamming banding) ----
  // The image near-dup rung the block family can't see: x06/x08 match
  // BYTES, a perceptual hash matches PICTURES — re-encoded or
  // slightly-corrupted copies share most aHash bits. Scale shape is
  // the d07 simhash discipline applied to media: one decode pass →
  // 64-bit hash per image (no pixels leave the task), split into four
  // 16-bit bands, bucket self-join on (band, code), exact-Hamming
  // verify on the candidates — precision vs the threshold is 1 by
  // construction, capture is GUARANTEED for Hamming ≤ 3 (pigeonhole
  // over 4 bands) and probabilistic beyond (the d10-banding recall
  // story) — and only ids+hashes cross the shuffle. With the stub
  // codec only
  // identical payloads decode alike (the x04 caveat), so the fixture
  // exercises the full banding/verify machinery on the clone set;
  // a real codec changes decodeImage only. Golden-gated (the x02
  // premise: per-record deterministic decode, partition-invariant —
  // sweep-re-proven); kernel laws in MultimodalSpec.
  private val phashTau = 15L

  private def x12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val banded = phashBanded(Multimodal.aHash(media(s, dir)))
    phashPairs(banded.as("x").join(banded.as("y"),
        $"x.band" === $"y.band" && $"x.code" === $"y.code" &&
        $"x.media_id" < $"y.media_id")
      .select($"x.media_id".as("id_x"), $"y.media_id".as("id_y"),
        $"x.phash".as("ph_x"), $"y.phash".as("ph_y")))
  }

  /** The banded phash index + the pair tail, factored so the batch
    * query and the s44 stream probe share one shape. */
  private[operators] def phashBanded(h: DataFrame): DataFrame =
    h.select(col("media_id"), col("phash"),
      posexplode(expr("transform(sequence(0, 3), b -> " +
        "(phash >> (b * 16)) & 65535)")).as(Seq("band", "code")))

  private[operators] def phashPairs(cands: DataFrame): DataFrame =
    cands
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"),
        bit_count(col("ph_x").bitwiseXOR(col("ph_y"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= phashTau && col("id_a") < col("id_b"))

  // ---- x14: REAL-format codec round-trip (oracle-gated) ----
  // The real-bytes path, oracle-gated rather than spec-gated (VERDICT
  // r14 next 8): every doc's payload bytes become a real P6 image
  // (pixels = the leading bytes), a 2-frame concatenated-P6 video, and
  // a RIFF/WAVE PCM clip (samples = LE byte pairs) via RealFormats;
  // PpmWavCodec then PARSES those bytes back (header token walk,
  // frame offset walk, chunk walk) and the md5 of every DECODED tensor
  // is compared against DuckDB's md5 of the same byte slice of the
  // source text — a codec that mis-walks any header/offset/chunk
  // diverges on the hash. Universe = ASCII docs (octet_length =
  // char_length, all fixture docs), so the oracle's VARCHAR substring
  // slicing is byte-exact by construction. Scale shape: one
  // mapPartitions projection, no shuffle — the d38 discipline with a
  // JVM kernel.
  private def x14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
      .filter(octet_length(col("text")) === length(col("text")) &&
        octet_length(col("text")) >= 6)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    docs.mapPartitions { it =>
      it.map { case (id, b) =>
        val w = b.length / 6
        val f0 = java.util.Arrays.copyOfRange(b, 0, 3 * w)
        val f1 = java.util.Arrays.copyOfRange(b, 3 * w, 6 * w)
        val meta = Multimodal.MediaMeta("video", "ppm", w, 1, 3, 16000, 0L, 2)
        val img = Multimodal.PpmWavCodec.decodeImage(meta,
          Multimodal.RealFormats.encodePpm(Multimodal.ImageTensor(id, w, 1, 3, f0)))
        val fr1 = Multimodal.PpmWavCodec.decodeFrame(meta,
          Multimodal.RealFormats.encodePpmFrames(Seq(
            Multimodal.ImageTensor(id, w, 1, 3, f0),
            Multimodal.ImageTensor(id, w, 1, 3, f1))), 1)
        val n = b.length / 2
        val samples = Array.tabulate(n)(k =>
          ((b(2 * k) & 0xff) | (b(2 * k + 1) << 8)).toShort)
        val dec = Multimodal.PpmWavCodec.decodeAudio(meta,
          Multimodal.RealFormats.encodeWav(samples, 16000))
        val le = new Array[Byte](dec.length * 2)
        var k = 0
        while (k < dec.length) {
          le(2 * k) = (dec(k) & 0xff).toByte
          le(2 * k + 1) = ((dec(k) >> 8) & 0xff).toByte
          k += 1
        }
        (id, img.width.toLong, img.pixels, fr1.pixels, dec.length.toLong, le)
      }
    }.toDF("doc_id", "img_w", "img_px", "fr1_px", "wav_n", "wav_le")
      .select(col("doc_id"), col("img_w"),
        md5(col("img_px")).as("img_md5"),
        md5(col("fr1_px")).as("frame1_md5"),
        col("wav_n"), md5(col("wav_le")).as("wav_md5"))
  }
  private val x14Sql =
    """SELECT doc_id,
      |  CAST(length(text) // 6 AS BIGINT) AS img_w,
      |  md5(substring(text, 1, 3 * (length(text) // 6))) AS img_md5,
      |  md5(substring(text, 3 * (length(text) // 6) + 1,
      |    3 * (length(text) // 6))) AS frame1_md5,
      |  CAST(length(text) // 2 AS BIGINT) AS wav_n,
      |  md5(substring(text, 1, 2 * (length(text) // 2))) AS wav_md5
      |FROM documents
      |WHERE octet_length(encode(text)) = length(text)
      |  AND length(text) >= 6""".stripMargin

  // ---- x15: paired image-text mismatch screen ----
  // The joint-modality analog of d23 contamination — the screen a
  // paired (image, caption) training set runs before contrastive
  // training trusts its pairs: a caption that does not describe its
  // image poisons the pair, and at crawl scale mispairings are routine
  // (alt-text of the wrong asset, CDN mix-ups, template captions).
  // The image side rides the SAME opaque-binary ingest path as every
  // media query (payload bytes never interpreted as media), the text
  // side is the caption; the screen scores caption→payload TRIGRAM
  // CONTAINMENT (|distinct caption 3-grams ∩ payload 3-grams| /
  // |distinct caption 3-grams|, micro-snapped integer arithmetic) and
  // flags pairs under tau. Unigrams would be blind here — the fixture
  // vocabulary appears in every doc (the d17 finding) — while a
  // matched caption is a contiguous prefix, so its trigrams are ALL
  // contained: matched pairs score exactly 1e6, planted mispairs
  // 0–0.125e6 at sf0.01, and the 0.5 tau sits in a wide margin.
  // Pairs are synthesized deterministically: doc k's image takes the
  // caption of donor k-1 when k % 10 == 3 (the planted 10% mispair
  // rate), its own caption otherwise. Pairs whose caption or payload
  // carries < 3 tokens are 'unscoreable' and KEPT (the d33 rule).
  // Scale shape: one broadcast-able caption-prefix table joined on
  // donor id + one map-only scoring projection — no explode, no
  // gram-key shuffle; the gram walk is a per-row HOF.
  private val capLen = 10
  private val mismatchTauMicro = 500000L
  private def x15(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val pairs = media(s, dir).toDF()
      .filter(length(trim(col("payload").cast("string"))) > 0)
      .select(col("media_id").as("doc_id"),
        TextOps.tokensOnce(col("payload").cast("string")).as("ptoks"))
      .withColumn("donor_id",
        expr("CASE WHEN doc_id % 10 = 3 THEN doc_id - 1 ELSE doc_id END"))
    val caps = Tables(s, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id").as("donor_id"),
        slice(TextOps.tokensOnce(col("text")), 1, capLen).as("ct"))
    pairScreen(pairs, caps)
  }

  /** The scoring projection over explicit (doc_id, donor_id, ptoks)
    * pairs and a (donor_id, ct) caption-prefix table — the seam
    * MultimodalSpec drives with constructed mispairs. */
  private[graft] def pairScreen(pairs: DataFrame, caps: DataFrame)
      : DataFrame = {
    import graft.text.TextOps
    pairs.join(caps, Seq("donor_id"), "left")
      .withColumn("cg", when(size(col("ct")) >= 3,
        TextOps.shingles("ct", 3)))
      .withColumn("pg", when(size(col("ptoks")) >= 3,
        TextOps.shingles("ptoks", 3)))
      .withColumn("n_hits", expr(
        "CASE WHEN cg IS NULL OR pg IS NULL THEN NULL ELSE " +
          "cast(size(filter(cg, g -> array_contains(pg, g))) as bigint) END"))
      .withColumn("score_micro", expr(
        "n_hits * 1000000 div cast(size(cg) as bigint)"))
      .select(col("doc_id"), col("donor_id"),
        size(col("cg")).cast("long").as("n_cap_grams"),
        col("n_hits"), col("score_micro"),
        when(col("score_micro").isNull, lit("unscoreable"))
          .when(col("score_micro") < mismatchTauMicro, lit("mismatch"))
          .otherwise(lit("ok")).as("verdict"))
  }
  private val x15Sql =
    s"""WITH t AS (SELECT doc_id, string_split(lower(trim(
       |    regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
       |  FROM documents WHERE length(trim(text)) > 0),
       |pgr AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
       |    list_distinct(list_transform(generate_series(1, len(toks) - 2),
       |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
       |    ELSE NULL END AS pg FROM t),
       |cgr AS (SELECT doc_id AS donor_id,
       |    CASE WHEN least(len(toks), $capLen) >= 3 THEN
       |    list_distinct(list_transform(
       |      generate_series(1, least(len(toks), $capLen) - 2),
       |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
       |    ELSE NULL END AS cg FROM t),
       |p AS (SELECT doc_id, CASE WHEN doc_id % 10 = 3 THEN doc_id - 1
       |    ELSE doc_id END AS donor_id FROM t),
       |j AS (SELECT p.doc_id, p.donor_id, pgr.pg, cgr.cg
       |  FROM p JOIN pgr ON p.doc_id = pgr.doc_id
       |  LEFT JOIN cgr ON p.donor_id = cgr.donor_id),
       |sc AS (SELECT doc_id, donor_id,
       |    CAST(len(cg) AS BIGINT) AS n_cap_grams,
       |    CASE WHEN cg IS NULL OR pg IS NULL THEN NULL
       |      ELSE CAST(len(list_filter(cg, g -> list_contains(pg, g)))
       |        AS BIGINT) END AS n_hits,
       |    CASE WHEN cg IS NULL OR pg IS NULL THEN NULL
       |      ELSE CAST(len(list_filter(cg, g -> list_contains(pg, g)))
       |        AS BIGINT) * 1000000 // CAST(len(cg) AS BIGINT) END
       |      AS score_micro
       |  FROM j)
       |SELECT doc_id, donor_id, n_cap_grams, n_hits, score_micro,
       |  CASE WHEN score_micro IS NULL THEN 'unscoreable'
       |    WHEN score_micro < $mismatchTauMicro THEN 'mismatch'
       |    ELSE 'ok' END AS verdict
       |FROM sc""".stripMargin

  val all: Seq[Q] = Seq(
    Q("x15_pair_mismatch_screen", x15, Some(x15Sql)),
    Q("x14_real_codec_roundtrip", x14, Some(x14Sql)),
    Q("x12_phash_neardup", x12, Some(GoldenOracles.x12)),
    Q("x01_media_ingest", x01, Some(x01Sql)),
    Q("x02_image_features", x02, Some(GoldenOracles.x02)),
    Q("x03_frame_sample", x03, Some(x03Sql)),
    Q("x04_media_dedup", x04, Some(GoldenOracles.x04)),
    Q("x05_audio_features", x05, Some(GoldenOracles.x05)),
    Q("x06_block_dedup", x06, Some(x06Sql)),
    Q("x07_cdc_chunks", x07, Some(GoldenOracles.x07)),
    Q("x08_block_neardup", x08, Some(x08Sql)),
    Q("x09_modality_coverage", x09, Some(x09Sql)),
    Q("x10_cdc_dial_curve", x10, Some(GoldenOracles.x10)),
    Q("x11_scene_segments", x11, Some(GoldenOracles.x11)),
    Q("x13_audio_vad", x13, Some(GoldenOracles.x13)),
    // second-scale gates (VERDICT r18 next 2): the feature tables are
    // ~5,000 rows at sf0.1 — too large for VALUES literals — so the
    // full outputs are gated at both scales through 1-row
    // order-insensitive digests (DigestGate / GoldenOracles.x02d etc.)
    Q("x02d_image_features_digest",
      (s, d) => DigestGate.digest(x02(s, d)), Some(GoldenOracles.x02d)),
    Q("x04d_media_dedup_digest",
      (s, d) => DigestGate.digest(x04(s, d)), Some(GoldenOracles.x04d)),
    Q("x05d_audio_features_digest",
      (s, d) => DigestGate.digest(x05(s, d)), Some(GoldenOracles.x05d)),
    Q("x07d_cdc_chunks_digest",
      (s, d) => DigestGate.digest(x07(s, d)), Some(GoldenOracles.x07d)),
    Q("x11d_scene_segments_digest",
      (s, d) => DigestGate.digest(x11(s, d)), Some(GoldenOracles.x11d)),
    Q("x13d_audio_vad_digest",
      (s, d) => DigestGate.digest(x13(s, d)), Some(GoldenOracles.x13d)))
}
