package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** 10×-scale verification for the golden-pinned queries.
  *
  * The driver's DuckDB gate proves every registered query at sf0.01,
  * and the sf0.1 oracle sweep re-proves every SQL-expressed oracle at
  * ten times that — but the golden-gated queries (pinned VALUES
  * tables — the pure goldens plus s24, whose oracle IS
  * GoldenOracles.d58 verbatim, and d60/d69, whose SQL oracles inline
  * that golden as a CTE — ADVICE r12; `goldenNames` below is the
  * authoritative list) are constants of the gate scale, so
  * the 10× sweep is blind to them (VERDICT r9 §missing 1). A sweep
  * harness must therefore NOT re-run s24's or d60's "SQL" at sf0.1 —
  * d60's embedded flagged-doc list is a gate-scale constant while its
  * Spark side computes live flags, so the re-run would false-fail.
  * This spec closes the gap by re-running the RECIPE that pinned each
  * golden, at the sweep scale:
  *
  *  - partition invariance, the pinning premise for every golden
  *    (verified 8- vs 32-core before pinning): each query must be
  *    bit-identical under deliberately contrasting partitionings —
  *    few wide scan splits + 5 shuffle partitions vs many narrow
  *    splits + 32. A golden is only a constant of the fixture if no
  *    partial-aggregation order leaks into the output; this is the
  *    property that breaks first when someone introduces an
  *    unsnapped double fold.
  *  - cross-path equality where an independent second path exists at
  *    any SF: v11's disk-layout IVFADC probe must equal v09's
  *    in-memory probe (same golden by construction at sf0.01 — here
  *    re-proven at 10×), and g01's seeded generator rollup is
  *    dataset-independent, so its sf0.1 output must equal its sf0.01
  *    output (the very table the driver oracle-gates).
  *
  * The remaining non-circularity of the golden VALUES themselves is
  * carried by the algorithm checks that ran at pinning time and still
  * run every build (d10–d12 md5 siblings — SQL-oracled at sf0.1 by the
  * sweep, PQ/CDC plain-Scala reimplementations, v06 ≡ v01, sketch-error
  * specs); what this spec adds is the determinism-at-10× leg those
  * checks can't see.
  *
  * Scale dir override: SPARK_GRAFT_GOLDEN_SF (default sf0.1).
  */
class GoldenSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_GOLDEN_SF", "/root/testdata/sf0.1")

  /** The 44 golden-gated queries: every Catalog entry whose oracle is
    * a pinned GoldenOracles VALUES table — verbatim (the pure goldens
    * and s24, gated on GoldenOracles.d58 itself) or embedded (d60,
    * d69, d70 and d74, whose SQL oracles inline that golden as a
    * CTE). */
  private val goldenNames = Seq(
    "d06_minhash_lsh", "d07_simhash", "d08_fingerprints",
    "d58_fuzzy_decontam_prod", "d60_curation_manifest_v2",
    "d69_curation_manifest_v3", "d70_contamination_report",
    "d79_curation_manifest_v4",
    "d74_source_datasheet",
    "g01_gaussian_generator", "m05_kmeans_scalable_init",
    "m08_gmm_quality",
    "n02_damds_embed", "q31_approx_stats",
    "s24_stream_fuzzy_decontam", "s29_stream_ann_search",
    "s30_stream_scene_segments", "s41_stream_pca", "s44_stream_phash_probe",
    "s47_stream_audio_vad",
    "v05_knn_ivf", "v08_knn_pq_adc", "v09_knn_ivfpq", "v11_knn_ivfpq_disk",
    "v25_ivf_recall_curve", "v28_ivf_incremental",
    "v30_filtered_recall_curve", "v32_pca_power", "v33_pca_spectrum",
    "x02_image_features", "x04_media_dedup", "x05_audio_features",
    "x07_cdc_chunks", "x10_cdc_dial_curve", "x11_scene_segments",
    "x12_phash_neardup", "x13_audio_vad",
    // r19 second-scale digest companions (DigestGate): golden-gated at
    // BOTH scales, so the invariance leg must cover them too — their
    // XOR folds are order-invariant by construction, but the premise
    // that each underlying ROW is partition-independent is exactly
    // what this sweep exists to re-prove
    "d07d_simhash_digest", "x02d_image_features_digest",
    "x04d_media_dedup_digest", "x05d_audio_features_digest",
    "x07d_cdc_chunks_digest", "x11d_scene_segments_digest",
    "x13d_audio_vad_digest")

  /** Canonical form: every row rendered (Row.toString keeps the -0.0 /
    * 0.0 distinction and full double precision), sorted. */
  private def canon(name: String, confs: Seq[(String, String)]): Seq[String] =
    Tables.withConfs(spark, confs) {
      Catalog.queries(name)(spark, sfDir).collect().map(_.toString).sorted.toSeq
    }

  private val wideSplits = Seq(
    "spark.sql.shuffle.partitions" -> "5",
    "spark.sql.files.maxPartitionBytes" -> "262144",
    "spark.sql.files.openCostInBytes" -> "0")
  private val narrowSplits = Seq(
    "spark.sql.shuffle.partitions" -> "32",
    "spark.sql.files.maxPartitionBytes" -> "134217728")

  for (name <- goldenNames)
    test(s"$name is partition-invariant at the sweep scale ($sfDir)") {
      val a = canon(name, wideSplits)
      val b = canon(name, narrowSplits)
      assert(a.nonEmpty, s"$name returned no rows at $sfDir")
      assert(a == b,
        s"$name output depends on partitioning at $sfDir — the " +
          s"golden-pinning premise is broken (${a.size} vs ${b.size} rows; " +
          s"first diff: ${a.zip(b).find(p => p._1 != p._2)})")
    }

  test("d60 composed manifest holds its screen contract against the LIVE screens, any scale") {
    // d60's SQL oracle is gate-scale-pinned (the inlined d58 golden),
    // so the sweep can't re-run it — what IS scale-free is the
    // composition contract, re-proven here against the live screens
    // at the sweep dir (the v25-invariant pattern, ADVICE r12): no
    // sampled doc is flagged by the live production fuzzy screen,
    // none is dropped by the live Bloom majority rule, every sampled
    // doc sits outside the fuzzy ladder's eval suite, and each
    // source's sample is a dense 1..n rank prefix of size <= 5 (curK).
    import org.apache.spark.sql.functions._
    val d60 = Catalog.queries("d60_curation_manifest_v2")(spark, sfDir)
      .cache()
    try {
      assert(d60.count() > 0, s"d60 returned no rows at $sfDir")
      val sampled = d60.select(col("doc_id")).distinct()
      val flagged = Catalog.queries("d58_fuzzy_decontam_prod")(spark, sfDir)
        .select(col("doc_id")).distinct()
      val dropped = Catalog.queries("d57_bloom_contamination")(spark, sfDir)
        .filter(col("n_bloom_hits") * 2 > col("total_5grams"))
        .select(col("doc_id"))
      assert(sampled.join(flagged, "doc_id").count() == 0,
        s"sampled ∩ live fuzzy-flagged must be empty at $sfDir")
      assert(sampled.join(dropped, "doc_id").count() == 0,
        s"sampled ∩ live bloom-dropped must be empty at $sfDir")
      assert(d60.filter(col("doc_id") < TextQueries.fuzzyEvalN).count() == 0,
        s"eval-suite docs leaked into the sample at $sfDir")
      val badRanks = d60.groupBy(col("source"))
        .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
        .filter(col("mx") =!= col("n") || col("n") > 5)
      assert(badRanks.count() == 0,
        s"per-source sample is not a dense rank prefix of size <= 5 at $sfDir")
    } finally d60.unpersist()
  }

  test("d69 manifest v3 holds the semantic rung against the LIVE screen, any scale") {
    // d69 inherits d60's gate-scale-pinned oracle (the inlined d58
    // golden), so the sweep re-proves its composition contract
    // structurally: everything d60's sweep test checks, plus the new
    // rung — no sampled doc may be flagged by the LIVE semantic
    // screen at the sweep dir
    import org.apache.spark.sql.functions._
    val d69 = Catalog.queries("d69_curation_manifest_v3")(spark, sfDir)
      .cache()
    try {
      assert(d69.count() > 0, s"d69 returned no rows at $sfDir")
      val sampled = d69.select(col("doc_id")).distinct()
      val semFlagged = Catalog.queries("v31_semantic_decontam")(spark, sfDir)
        .select(col("vec_id").as("doc_id")).distinct()
      assert(sampled.join(semFlagged, "doc_id").count() == 0,
        s"sampled ∩ live semantic-flagged must be empty at $sfDir")
      val flagged = Catalog.queries("d58_fuzzy_decontam_prod")(spark, sfDir)
        .select(col("doc_id")).distinct()
      assert(sampled.join(flagged, "doc_id").count() == 0,
        s"sampled ∩ live fuzzy-flagged must be empty at $sfDir")
      assert(d69.filter(col("doc_id") < TextQueries.fuzzyEvalN).count() == 0,
        s"eval-suite docs leaked into the v3 sample at $sfDir")
      val badRanks = d69.groupBy(col("source"))
        .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
        .filter(col("mx") =!= col("n") || col("n") > 5)
      assert(badRanks.count() == 0,
        s"per-source v3 sample is not a dense rank prefix of size <= 5 at $sfDir")
    } finally d69.unpersist()
  }

  test("d79 manifest v4 holds the dedup-aware weight contract live, any scale") {
    // d79 inherits the gate-scale-pinned screens (the inlined d58
    // golden), so the sweep re-proves its composition structurally:
    // the v3 screen contract (no sampled doc flagged by any LIVE
    // screen), plus the new rung's law — every sampled doc has LIVE
    // clean_tokens > 0 under d72 (a fully-duplicated doc must never
    // be sampled; that exclusion is the point of the v4 weights).
    import org.apache.spark.sql.functions._
    val d79 = Catalog.queries("d79_curation_manifest_v4")(spark, sfDir)
      .cache()
    try {
      assert(d79.count() > 0, s"d79 returned no rows at $sfDir")
      val sampled = d79.select(col("doc_id")).distinct()
      for ((name, ids) <- Seq(
          "d58" -> Catalog.queries("d58_fuzzy_decontam_prod")(spark, sfDir)
            .select(col("doc_id")),
          "d57" -> Catalog.queries("d57_bloom_contamination")(spark, sfDir)
            .filter(col("n_bloom_hits") * 2 > col("total_5grams"))
            .select(col("doc_id")),
          "v31" -> Catalog.queries("v31_semantic_decontam")(spark, sfDir)
            .select(col("vec_id").as("doc_id"))))
        assert(sampled.join(ids.distinct(), "doc_id").count() == 0,
          s"sampled ∩ live $name-flagged must be empty at $sfDir")
      val zeroClean = Catalog.queries("d72_dup_span_scrub")(spark, sfDir)
        .filter(col("clean_tokens") === 0L).select(col("doc_id"))
      assert(sampled.join(zeroClean, "doc_id").count() == 0,
        s"a fully-duplicated doc was sampled at $sfDir")
      val badRanks = d79.groupBy(col("source"))
        .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
        .filter(col("mx") =!= col("n") || col("n") > 5)
      assert(badRanks.count() == 0,
        s"per-source v4 sample is not a dense rank prefix of size <= 5 at $sfDir")
    } finally d79.unpersist()
  }

  test("d74 datasheet reconciles with the LIVE screens and ledgers, any scale") {
    // d74's oracle inlines the d58 golden (via d70's CTEs), so the
    // sweep re-proves the card's composition contract against the
    // LIVE engines at the sweep dir: per-source doc counts match the
    // corpus directly, the semantic flag column matches v31 live, the
    // keep column complements the union of live flag sets, and the
    // duplication charge matches the live d72 scrub ledger (whose own
    // SQL oracle is scale-free).
    import org.apache.spark.sql.functions._
    val card = Catalog.queries("d74_source_datasheet")(spark, sfDir).cache()
    try {
      assert(card.count() > 0, s"d74 returned no rows at $sfDir")
      val uni = graft.Tables(spark, sfDir, "documents")
        .filter(col("doc_id") >= TextQueries.fuzzyEvalN &&
          length(trim(col("text"))) > 0)
      val wantDocs = uni.groupBy(col("source"))
        .agg(count(lit(1)).as("want_docs"))
      val badDocs = card.join(wantDocs, "source")
        .filter(col("n_docs") =!= col("want_docs"))
      assert(badDocs.count() == 0, s"n_docs diverges from the corpus at $sfDir")
      val semLive = Catalog.queries("v31_semantic_decontam")(spark, sfDir)
        .select(col("vec_id").as("doc_id")).distinct()
        .join(uni.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source")).agg(count(lit(1)).as("want_sem"))
      val badSem = card.join(semLive, Seq("source"), "left")
        .filter(col("n_flag_semantic") =!= coalesce(col("want_sem"), lit(0L)))
      assert(badSem.count() == 0, s"semantic flags diverge from v31 at $sfDir")
      val dupLive = Catalog.queries("d72_dup_span_scrub")(spark, sfDir)
        .join(uni.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source")).agg(sum(col("dup_tokens")).as("want_dup"))
      val badDup = card.join(dupLive, Seq("source"), "left")
        .filter(col("dup_tokens") =!= coalesce(col("want_dup"), lit(0L)))
      assert(badDup.count() == 0, s"dup charge diverges from d72 at $sfDir")
      // keep complements the union of live flag sets
      val fuzzy = Catalog.queries("d58_fuzzy_decontam_prod")(spark, sfDir)
        .select(col("doc_id")).distinct()
      val bloom = Catalog.queries("d57_bloom_contamination")(spark, sfDir)
        .filter(col("n_bloom_hits") * 2 > col("total_5grams"))
        .select(col("doc_id")).distinct()
      val sem = Catalog.queries("v31_semantic_decontam")(spark, sfDir)
        .select(col("vec_id").as("doc_id")).distinct()
      val wantKeep = uni.select(col("doc_id"), col("source"))
        .join(fuzzy.union(bloom).union(sem).distinct()
          .withColumn("fl", lit(1L)), Seq("doc_id"), "left")
        .filter(col("fl").isNull)
        .groupBy(col("source")).agg(count(lit(1)).as("want_keep"))
      val badKeep = card.join(wantKeep, Seq("source"), "left")
        .filter(col("n_keep") =!= coalesce(col("want_keep"), lit(0L)))
      assert(badKeep.count() == 0, s"keep column diverges from the live screens at $sfDir")
    } finally card.unpersist()
  }

  test("v25 recall curve is monotone and exact at the full probe budget, any scale") {
    // the golden pins sf0.01 values; these are the scale-free structural
    // invariants at the sweep dir: recall is non-decreasing in nprobe,
    // and probing every cell must recover the exact top-k (1e6 ppm) —
    // if not, the cell assignment and the probe ranking disagree
    val rows = canon("v25_ivf_recall_curve", narrowSplits)
      .map { s =>
        val p = s.stripPrefix("[").stripSuffix("]").split(",")
        (p(0).toLong, p(2).toLong)
      }.sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.zip(rows.tail).forall { case ((_, a), (_, b)) => a <= b },
      s"recall decreases with nprobe: $rows")
    assert(rows.last._1 == 16L && rows.last._2 == 1000000L,
      s"full probe budget must be exact: $rows")
  }

  test("v11 disk-layout probe equals v09 in-memory probe at the sweep scale") {
    val mem = canon("v09_knn_ivfpq", narrowSplits)
    val disk = canon("v11_knn_ivfpq_disk", narrowSplits)
    assert(mem.nonEmpty && mem == disk,
      s"IVFADC disk path diverges from memory path at $sfDir")
  }

  test("s30/s47 stream lifts equal their batch tables at the sweep scale") {
    // the two stream lifts whose oracles stay gate-scale-pinned (their
    // batch twins' sf0.1 outputs are VALUES-infeasible, gated by the
    // x11d/x13d digests instead): the stream path must produce the
    // SAME table as the batch path at the sweep scale, which chains
    // the digests' sf0.1 gate onto the lifts without new literals
    for ((sName, xName) <- Seq(
        "s30_stream_scene_segments" -> "x11_scene_segments",
        "s47_stream_audio_vad" -> "x13_audio_vad")) {
      val streamed = canon(sName, narrowSplits)
      val batch = canon(xName, narrowSplits)
      assert(streamed.nonEmpty && streamed == batch,
        s"$sName diverges from $xName at $sfDir")
    }
  }

  test("v08 PQ-ADC equals a plain-Scala reimplementation at the sweep scale") {
    // the pinning-time recipe (VectorOpsSpec's sf0.001 leg) re-run at
    // sweep scale, where the corpus is 4× the gate fixture: retrain
    // the codebooks with an inline Lloyd's, re-encode, ADC-score,
    // shortlist, exact-rerank — all driver-side — and require the
    // identical (qid, rank, vec_id) answer with matching cosines.
    // The corpus gather is a TEST-ONLY device (2000 × 64 doubles);
    // the engine under test never collects vectors.
    import spark.implicits._
    val M = 8; val SUB = 8; val K = 16; val L = 64
    val nQ = 5; val topK = 10
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", graft.vec.VectorOps.toDouble($"embedding").as("v"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => (id, v.toArray) }.sortBy(_._1)
    val sample = all.filter(_._1 < 4096L)
    def lloyd(pts: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
      var cur = pts.take(k).map(_.clone())
      for (_ <- 0 until iters) {
        val sums = Array.ofDim[Double](k, pts.head.length)
        val counts = new Array[Long](k)
        pts.foreach { v =>
          var best = 0; var bd = Double.MaxValue
          for (c <- 0 until k) {
            var dd = 0.0
            for (j <- v.indices) { val t = v(j) - cur(c)(j); dd += t * t }
            if (dd < bd) { bd = dd; best = c }
          }
          for (j <- v.indices) sums(best)(j) += v(j)
          counts(best) += 1
        }
        cur = Array.tabulate(k)(c =>
          if (counts(c) > 0) Array.tabulate(pts.head.length)(j => sums(c)(j) / counts(c))
          else cur(c))
      }
      cur
    }
    val books = Array.tabulate(M)(j =>
      lloyd(sample.map(_._2.slice(j * SUB, (j + 1) * SUB)), K, 3))
    def encode(v: Array[Double]): Array[Int] = Array.tabulate(M) { j =>
      val s = v.slice(j * SUB, (j + 1) * SUB)
      var best = 0; var bd = Double.MaxValue
      for (c <- 0 until K) {
        var dd = 0.0
        for (i <- 0 until SUB) { val t = s(i) - books(j)(c)(i); dd += t * t }
        if (dd < bd) { bd = dd; best = c }
      }
      best
    }
    val codes = all.map { case (id, v) => (id, encode(v)) }
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (0L until nQ).flatMap { qid =>
      val qv = all.find(_._1 == qid).get._2
      val dlut = Array.tabulate(M, K) { (j, c) =>
        val qs = qv.slice(j * SUB, (j + 1) * SUB)
        qs.indices.map(i => qs(i) * books(j)(c)(i)).sum
      }
      val qn = math.sqrt(qv.map(x => x * x).sum)
      val short = codes.filter(_._1 != qid).map { case (id, cs) =>
        val num = (0 until M).map(j => dlut(j)(cs(j))).sum
        val rn = math.sqrt((0 until M).map(j =>
          books(j)(cs(j)).map(x => x * x).sum).sum)
        (id, num / (qn * rn))
      }.sortBy { case (id, s) => (-s, id) }.take(L).map(_._1).toSet
      all.filter { case (id, _) => short.contains(id) }
        .map { case (id, v) => (id, cosine(v, qv)) }
        .sortBy { case (id, s) => (-s, id) }.take(topK)
        .zipWithIndex.map { case ((id, s), r) => (qid, (r + 1).toLong, id, s) }
    }.toSet
    val got = Catalog.queries("v08_knn_pq_adc")(spark, sfDir)
      .select($"qid", $"rank", $"vec_id", $"cosine")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got.map(t => (t._1, t._2, t._3)) == expected.map(t => (t._1, t._2, t._3)),
      s"PQ answer diverges from reimplementation at $sfDir:\n" +
        s"extra=${got.map(t => (t._1, t._2, t._3)) -- expected.map(t => (t._1, t._2, t._3))}\n" +
        s"missing=${expected.map(t => (t._1, t._2, t._3)) -- got.map(t => (t._1, t._2, t._3))}")
    val expByKey = expected.map(t => ((t._1, t._3), t._4)).toMap
    got.foreach { case (qid, _, id, cos) =>
      assert(math.abs(cos - expByKey((qid, id))) < 1e-6,
        s"cosine mismatch for ($qid,$id): $cos vs ${expByKey((qid, id))}")
    }
  }

  test("g01 seeded generator rollup is dataset-independent (sf0.1 ≡ sf0.01)") {
    val at10x = canon("g01_gaussian_generator", narrowSplits)
    val atGate = Catalog.queries("g01_gaussian_generator")(
      spark, TestSpark.sf001).collect().map(_.toString).sorted.toSeq
    assert(at10x == atGate,
      "seeded generator output varies with the sf dir — it must be a " +
        "constant of the seed alone")
  }
}
