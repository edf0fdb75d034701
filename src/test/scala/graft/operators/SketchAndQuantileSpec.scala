package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic guards for the bounded-statistics family (d46 KMV sketch,
  * d47 histogram quantiles, v22 RRF fusion) beyond the oracle's
  * value-equality gate: the sketch's error must actually be small, the
  * quantiles must actually be quantiles, and the fused ranking must
  * actually contain its inputs' consensus hits.
  */
class SketchAndQuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("d46 KMV estimate lands within the theoretical error band") {
    // KMV with k=256 has relative standard error ~ 1/sqrt(k-2) ≈ 6.3%;
    // assert every source's self-reported err_pct is inside 4 RSEs —
    // loose enough to never flap, tight enough that a broken estimator
    // (wrong hash width, off-by-one rank, swapped operands) fails.
    val rows = Catalog.queries("d46_kmv_distinct")(spark, TestSpark.sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = r.getAs[Double]("err_pct")
      assert(err >= 0.0 && err <= 0.25,
        s"source ${r.getAs[String]("source")}: err_pct $err outside band")
    }
  }

  test("d46 falls back to the exact count under k distinct hashes") {
    // a source with fewer than k distinct hashes must report the exact
    // sketch-side count: est_distinct == n_exact whenever n_exact < k
    // (40-bit collisions on a sub-256 vocabulary are ~0, so hash count
    // == term count; a sparser fixture slice exercises this branch)
    val rows = Catalog.queries("d46_kmv_distinct")(spark, TestSpark.sf0001)
      .collect()
    val small = rows.filter(_.getAs[Long]("n_exact") < 256)
    assert(small.nonEmpty,
      "fixture assumption: sf0.001 has sources under k distinct terms")
    small.foreach { r =>
      assert(r.getAs[Double]("est_distinct") == r.getAs[Long]("n_exact").toDouble,
        s"source ${r.getAs[String]("source")}: exact-branch estimate diverges")
    }
  }

  test("d47 quantiles are monotone and bracket the true median") {
    import spark.implicits._
    val q = Catalog.queries("d47_length_quantiles")(spark, TestSpark.sf001)
    val rows = q.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getAs[Long]("p50"), r.getAs[Long]("p90"),
        r.getAs[Long]("p99"))
      assert(p50 <= p90 && p90 <= p99,
        s"non-monotone quantiles for ${r.getAs[String]("source")}")
    }
    // cross-check one source's p50 against Spark's own exact
    // percentile (type-1 lower quantile ⇒ within the two middle
    // order statistics of the interpolating percentile)
    val src = rows.head.getAs[String]("source")
    val lens = graft.Tables(spark, TestSpark.sf001, "documents")
      .filter(length(trim($"text")) > 0).filter($"source" === src)
      .select(size(graft.text.TextOps.tokens($"text")).cast("long").as("n"))
      .as[Long].collect().sorted
    val lower = lens((lens.length - 1) / 2)
    val upper = lens(lens.length / 2)
    val p50 = rows.find(_.getAs[String]("source") == src).get.getAs[Long]("p50")
    assert(p50 >= lower && p50 <= upper,
      s"p50 $p50 outside the median bracket [$lower, $upper]")
  }

  test("d46 KMV estimator branch holds its error band at real cardinality") {
    // the fixture vocabulary (31 terms) never reaches k = 256, so the
    // d46 oracle row only gates the exact branch; drive the factored
    // sketch with 5-gram sets (~1.2k+ distinct per source) where the
    // (k−1)·M/h_k estimator actually runs, and check every source
    // lands inside 4 relative standard errors (4/√254 ≈ 25%)
    import spark.implicits._
    val rows = TextQueries.kmvSketch(
        TextQueries.gramSets(spark, TestSpark.sf001)
          .select($"source", $"gram".as("term")))
      .collect()
    assert(rows.nonEmpty)
    val est = rows.filter(_.getAs[Long]("n_exact") >= 256)
    assert(est.nonEmpty, "fixture gram sets must exceed k distinct")
    est.foreach { r =>
      val err = r.getAs[Double]("err_pct")
      assert(err >= 0.0 && err <= 0.25,
        s"source ${r.getAs[String]("source")}: estimator err $err outside band")
    }
  }

  test("d49 HLL engages linear counting at tiny cardinality") {
    // the fixture's gram cardinalities (~1000+/source) always take the
    // raw-estimator branch; drive the factored register→estimate step
    // with 20 distinct values, where raw HLL is badly biased and the
    // small-range linear-counting branch must land near the truth
    import spark.implicits._
    val df = (0 until 20).map(i => ("s", s"value-$i")).toDF("source", "gram")
    val regs = df.select($"source", expr(
        "cast(conv(substring(md5(cast(gram as binary)), 1, 12), 16, 10) " +
          "as bigint)").as("h"))
      .select($"source", expr("shiftright(h, 40)").as("bucket"),
        expr("h & 1099511627775").as("w"))
      .groupBy($"source", $"bucket")
      .agg(max(expr("case when w = 0 then 41 else 41 - length(bin(w)) end"))
        .as("r"))
    val est = TextQueries.hllEstimate(regs)
      .collect()(0).getAs[Double]("est_distinct")
    assert(est > 12 && est < 30, s"LC-branch estimate $est far from 20")
  }

  test("fused HLL register aggregate equals the explode+agg row form") {
    // the r19 fused build (graft_hll_regs: per-doc gram walk into a
    // 256-byte buffer) must emit the exact (source, bucket, r) rows
    // the explode form derives — same md5 coin, multiset-max ≡
    // set-max. Checked on the real fixture so every bucket path
    // (multi-doc merges, short docs, per-doc repeats) is exercised.
    val rowForm = TextQueries.hllRegisters(
        TextQueries.gramOccurrences(spark, TestSpark.sf001))
      .collect().map(_.toSeq).toSet
    val fused = TextQueries.hllRegistersFused(
        graft.Tables(spark, TestSpark.sf001, "documents"))
      .collect().map(_.toSeq).toSet
    assert(fused == rowForm,
      s"fused registers diverge from the row form: " +
        s"only-fused=${fused -- rowForm} only-row=${rowForm -- fused}")
    assert(fused.nonEmpty)
  }

  test("v22 RRF fusion is a faithful rank combiner of its two inputs") {
    // unconditional RRF properties on the engine's own gated inputs:
    // every fused id came from an input top-10; any id in BOTH top-10s
    // scores >= 2/70, any single-ranking id <= 1/61, so dual hits must
    // outrank single hits (vacuous on a fixture whose lexical and
    // dense signals never agree — the synthetic embeddings are
    // independent of the text); and within one qid the fused scores
    // are non-increasing in rank.
    import spark.implicits._
    val lex = Catalog.queries("d45_bm25_retrieval")(spark, TestSpark.sf001)
      .select($"qid", $"doc_id".as("id"), $"rank".as("lr"))
    val den = Catalog.queries("v01_knn_exact")(spark, TestSpark.sf001)
      .select($"qid", $"vec_id".as("id"), $"rank".as("dr"))
    val fused = Catalog.queries("v22_rrf_fusion")(spark, TestSpark.sf001)
      .select($"qid", $"id", $"rank".as("fr"), $"rrf")
    val j = lex.join(den, Seq("qid", "id"), "full_outer")
      .join(fused, Seq("qid", "id"), "left_outer").collect()
    assert(j.nonEmpty)
    // provenance: every fused row joined back to an input
    val fusedCount = fused.count()
    assert(j.count(r => !r.isNullAt(4)) == fusedCount,
      "fused ranking contains an id retrieved by neither input")
    // dual hits outrank single hits per qid
    val dual = j.filter(r => !r.isNullAt(2) && !r.isNullAt(3))
    val single = j.filter(r => r.isNullAt(2) ^ r.isNullAt(3))
    dual.foreach { c =>
      single.filter(_.getLong(0) == c.getLong(0)).foreach { s =>
        val cf = if (c.isNullAt(4)) Long.MaxValue else c.getLong(4)
        val sf = if (s.isNullAt(4)) Long.MaxValue else s.getLong(4)
        assert(cf < sf, s"qid ${c.getLong(0)}: dual id ${c.getLong(1)} " +
          s"(fused $cf) below single id ${s.getLong(1)} (fused $sf)")
      }
    }
    // fused score non-increasing in fused rank
    fused.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"qid $qid: fused scores increase with rank")
    }
  }

  test("d54 bottom-k Jaccard estimates stay inside the error band") {
    // bottom-k with k=128 has absolute standard error
    // sqrt(J(1-J)/k) <= 0.045; the self-reported err column (|est −
    // exact|, both floor-snapped) must sit inside ~2× that for every
    // shard pair — loose enough to never flap on the deterministic
    // fixture (observed max 0.019), tight enough that a broken
    // estimator (wrong union rank, unsorted window, swapped flags)
    // fails. Full sketches also mean k_union is exactly k whenever
    // both shards have >= k hashes.
    val rows = Catalog.queries("d54_source_jaccard_sketch")(
      spark, TestSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = r.getAs[Double]("err")
      val est = r.getAs[Double]("est_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      assert(err >= 0.0 && err <= 0.1,
        s"${r.getAs[String]("src_a")}×${r.getAs[String]("src_b")}: " +
          s"err $err outside the estimator band")
    }
    // every unordered source pair appears exactly once
    val n = rows.map(r => (r.getAs[String]("src_a"),
      r.getAs[String]("src_b"))).toSet.size
    val srcs = rows.flatMap(r => Seq(r.getAs[String]("src_a"),
      r.getAs[String]("src_b"))).toSet.size
    assert(n == srcs * (srcs - 1) / 2,
      s"$n pairs for $srcs sources — pair domain incomplete")
  }

  test("d62 sketch-only overlap estimates track the exact d48 matrix") {
    // the production form's acceptance: every KMV-estimated quantity
    // must land near the exact audit it replaces — per-source distinct
    // counts within the KMV relative band (~2/sqrt(k) ≈ 0.18 at
    // k=128, doubled for headroom), and the containment fractions
    // within an absolute 0.1 of d48's exact frac_a/frac_b (fractions
    // compound two estimators, so the band is wider than d54's pure
    // Jaccard). Pair domains must agree exactly.
    val est = Catalog.queries("d62_source_overlap_sketch")(
      spark, TestSpark.sf001).collect()
      .map(r => (r.getAs[String]("sa"), r.getAs[String]("sb")) -> r).toMap
    val exact = Catalog.queries("d48_source_overlap")(
      spark, TestSpark.sf001).collect()
      .map(r => (r.getAs[String]("sa"), r.getAs[String]("sb")) -> r).toMap
    // d48 emits only pairs with >= 1 shared gram; d62 covers the full
    // pair domain (an auditor wants the zeros too) — so d48's pairs
    // must all be present, and the d62-only pairs are exactly the
    // zero-overlap ones, whose estimates must sit at ~0
    assert(exact.keySet.subsetOf(est.keySet),
      s"exact pairs missing from the sketch matrix: " +
        s"${exact.keySet -- est.keySet}")
    est.foreach { case (pair, e) =>
      exact.get(pair) match {
        case Some(x) =>
          val naRel = math.abs(e.getAs[Long]("na_est").toDouble /
            x.getAs[Long]("na") - 1.0)
          val nbRel = math.abs(e.getAs[Long]("nb_est").toDouble /
            x.getAs[Long]("nb") - 1.0)
          assert(naRel <= 0.36 && nbRel <= 0.36,
            s"$pair: per-source KMV count off by $naRel/$nbRel")
          val fa = math.abs(e.getAs[Double]("frac_a") -
            x.getAs[Double]("frac_a"))
          val fb = math.abs(e.getAs[Double]("frac_b") -
            x.getAs[Double]("frac_b"))
          assert(fa <= 0.1 && fb <= 0.1,
            s"$pair: containment estimate off by $fa/$fb")
        case None =>
          assert(e.getAs[Double]("frac_a") <= 0.1 &&
            e.getAs[Double]("frac_b") <= 0.1,
            s"$pair: zero-overlap pair estimated non-trivial containment")
      }
    }
  }

  test("d53 fuzzy decontamination screens only across the eval boundary") {
    // the screen's contract: every hit pairs a CORPUS doc with an EVAL
    // doc at verified est_jaccard >= 0.2 — corpus-internal near-dups
    // (dedup's business) must never be flagged. The sf0.01 fixture has
    // both populations: cross-boundary clones (8,245), (87,134), ...
    // and the corpus-internal pair (152,178) that a symmetric pair
    // engine would also emit.
    val rows = Catalog.queries("d53_fuzzy_decontam")(spark, TestSpark.sf001)
      .collect()
    assert(rows.nonEmpty, "fixture assumption: cross-boundary clones exist")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") >= 100L &&
        r.getAs[Long]("eval_id") < 100L,
        s"hit ${r.toSeq} crosses the wrong way")
      assert(r.getAs[Double]("est_jaccard") >= 0.2)
    }
    val flagged = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(flagged.contains(245L),
      "known eval clone (8 → 245) must be flagged")
    assert(!flagged.contains(178L),
      "corpus-internal near-dup (152, 178) must NOT be a contamination hit")
  }

  test("weighted sample (d59) actually skews toward heavier documents") {
    // the point of E-S weighting: inclusion odds scale with w, so the
    // selected docs' mean token count must exceed the corpus mean (a
    // uniform-sampling bug — e.g. dropping the /w — makes the two
    // means statistically equal and this margin fails)
    import spark.implicits._
    val dir = TestSpark.sf001
    val sel = Catalog.queries("d59_weighted_sample")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    val w = graft.Tables(spark, dir, "documents")
      .filter(length(trim($"text")) > 0)
      .select($"doc_id",
        size(graft.text.TextOps.tokens($"text")).cast("long").as("w"))
      .as[(Long, Long)].collect()
    val meanAll = w.map(_._2).sum.toDouble / w.length
    val meanSel = w.filter(t => sel(t._1)).map(_._2).sum.toDouble / sel.size
    info(f"mean tokens: corpus $meanAll%.1f, sample $meanSel%.1f")
    assert(meanSel > meanAll * 1.05,
      s"weighted sample not heavier than corpus: $meanSel vs $meanAll")
  }

  test("curation manifest v2 (d60) keeps contaminated docs out of the sample, non-vacuously") {
    // the composed pipeline's point: no d58-flagged doc may reach the
    // training sample — and the screen must actually matter on the
    // fixture (doc 290, an eval clone, wins a sample slot when the
    // screens are skipped; a silently-vacuous composition would pass
    // the exclusion check while filtering nothing)
    import spark.implicits._
    val dir = TestSpark.sf001
    val flagged = Catalog.queries("d58_fuzzy_decontam_prod")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    val sampled = Catalog.queries("d60_curation_manifest_v2")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert((sampled & flagged).isEmpty,
      s"contaminated docs sampled: ${sampled & flagged}")
    assert(flagged.contains(290L) && !sampled.contains(290L),
      "fixture assumption: eval clone 290 exists and is screened out")
  }

  test("manifest v3 (d69) also screens the semantic rung, non-vacuously") {
    // v3's addition: no v31-flagged (paraphrase-contaminated) doc may
    // reach the sample — and the rung must actually matter: the v3
    // sample must differ from v2's (the semantic screen removes
    // candidates v2 admitted), or composing it was a no-op
    import spark.implicits._
    val dir = TestSpark.sf001
    val semFlagged = Catalog.queries("v31_semantic_decontam")(spark, dir)
      .select($"vec_id").as[Long].collect().toSet
    val v3 = Catalog.queries("d69_curation_manifest_v3")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    val v2 = Catalog.queries("d60_curation_manifest_v2")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert((v3 & semFlagged).isEmpty,
      s"semantically contaminated docs sampled: ${v3 & semFlagged}")
    assert(v3 != v2,
      "the semantic rung must change the sample on the fixture")
    assert((v2 & semFlagged).nonEmpty,
      "fixture assumption: v2 admits at least one doc the semantic " +
        "screen would drop (otherwise the non-vacuity claim is hollow)")
  }

  test("production fuzzy decontamination (d58) finds every d53 hit and respects the boundary") {
    // d58 is d53 on the native xxhash64 engine over the FULL corpus;
    // a hash swap must not lose true clones — every (doc, eval) pair
    // the md5 oracle slice flags must reappear — and the asymmetric
    // contract (hits only cross the eval boundary) must hold on the
    // wider universe too
    val slice = Catalog.queries("d53_fuzzy_decontam")(spark, TestSpark.sf001)
      .collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_id"))).toSet
    val prod = Catalog.queries("d58_fuzzy_decontam_prod")(
      spark, TestSpark.sf001).collect()
    val prodPairs = prod.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_id"))).toSet
    assert(slice.subsetOf(prodPairs),
      s"hash swap lost true clones: ${slice -- prodPairs}")
    assert(prodPairs.size > slice.size,
      "full-corpus screen should see clones beyond the oracle slice")
    prod.foreach { r =>
      assert(r.getAs[Long]("doc_id") >= 100L &&
        r.getAs[Long]("eval_id") < 100L,
        s"hit ${r.toSeq} crosses the wrong way")
    }
  }

  test("v31 semantic screen flags only corpus-side vectors, above threshold, non-vacuously") {
    // the embedding rung of the decontamination ladder keeps the d53
    // boundary contract: every hit pairs a CORPUS vector (vec_id >=
    // sdEvalN) with an EVAL item (eval_id < sdEvalN) at cosine >= tau;
    // the fixture must actually produce hits or the screen is vacuous
    val rows = Catalog.queries("v31_semantic_decontam")(spark, TestSpark.sf001)
      .collect()
    assert(rows.nonEmpty, "semantic screen found no contamination at sf0.01")
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id") >= 50L,
        s"eval-side vector flagged as corpus: ${r.toSeq}")
      assert(r.getAs[Long]("eval_id") < 50L,
        s"corpus-side vector used as eval anchor: ${r.toSeq}")
      assert(r.getAs[Double]("cosine") >= 0.299999,
        s"sub-threshold hit leaked through: ${r.toSeq}")
    }
  }

  test("d65 count-min never under-counts and engages real collisions") {
    // the one-sided error theorem: ĉ(t) ≥ c(t) for EVERY term, any
    // data, any layout (counters only absorb mass). The dial check is
    // fixture-level: w = 16 sits below the vocabulary, so at sf0.01
    // both branches must be live — some terms collide in all 3 rows
    // (overcount > 0) and some own a clean bucket in at least one row
    // (overcount == 0); a vacuous dial would make the min-over-rows
    // logic untested by the oracle.
    val rows = Catalog.queries("d65_countmin_sketch")(spark, TestSpark.sf001)
      .collect()
    assert(rows.length > 20, "fixture vocabulary should exceed 20 terms")
    rows.foreach { r =>
      assert(r.getAs[Long]("cnt_est") >= r.getAs[Long]("cnt_exact"),
        s"term ${r.getAs[String]("term")}: count-min under-counted")
    }
    assert(rows.exists(_.getAs[Long]("overcount") > 0L),
      "w=16 should force real collisions at sf0.01")
    assert(rows.exists(_.getAs[Long]("overcount") == 0L),
      "some term should own a clean bucket in one of the 3 rows")
  }

  test("d70 report explains exactly what the manifests enforce") {
    // the provenance table must agree with the pipelines that consume
    // its verdicts: v3's sample lives entirely in the keep set, v2's
    // sample clears the two screens it applies (but may include
    // semantically-flagged docs — that's what v3 fixed), and the
    // roll-up columns are pure functions of the flags
    import spark.implicits._
    val dir = TestSpark.sf001
    val rows = Catalog.queries("d70_contamination_report")(spark, dir)
      .collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val (ff, fb, fs) = (r.getAs[Long]("flag_fuzzy"),
        r.getAs[Long]("flag_bloom"), r.getAs[Long]("flag_semantic"))
      assert(r.getAs[Long]("n_flags") == ff + fb + fs, s"bad n_flags: $r")
      assert(r.getAs[Long]("keep") == (if (ff + fb + fs == 0) 1L else 0L),
        s"bad keep: $r")
    }
    val keep = rows.filter(_.getAs[Long]("keep") == 1L)
      .map(_.getAs[Long]("doc_id")).toSet
    val twoScreenClear = rows.filter(r => r.getAs[Long]("flag_fuzzy") == 0L
      && r.getAs[Long]("flag_bloom") == 0L)
      .map(_.getAs[Long]("doc_id")).toSet
    val v3 = Catalog.queries("d69_curation_manifest_v3")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    val v2 = Catalog.queries("d60_curation_manifest_v2")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(v3.subsetOf(keep), s"v3 sampled outside keep: ${v3 -- keep}")
    assert(v2.subsetOf(twoScreenClear),
      s"v2 sampled docs its own screens flag: ${v2 -- twoScreenClear}")
  }

  test("d68 dial curve is monotone by the nested-counter theorem, per term") {
    // dials nest (8 | 16 | 64) and the base hash is width-independent,
    // so a narrow counter is the exact bucket-sum of wider ones: every
    // term's estimate is non-increasing in w — assert it PER TERM at
    // consecutive dials, and on the rolled-up curve
    val curve = Catalog.queries("d68_countmin_dial_curve")(
      spark, TestSpark.sf001).collect()
      .sortBy(_.getAs[Long]("w"))
    assert(curve.map(_.getAs[Long]("w")) sameElements Array(8L, 16L, 64L))
    curve.sliding(2).foreach {
      case Array(narrow, wide) =>
        assert(wide.getAs[Long]("total_overcount") <=
          narrow.getAs[Long]("total_overcount"), "total not monotone")
        assert(wide.getAs[Long]("max_overcount") <=
          narrow.getAs[Long]("max_overcount"), "max not monotone")
        assert(wide.getAs[Long]("n_collided") <=
          narrow.getAs[Long]("n_collided"), "collisions not monotone")
      case _ =>
    }
    val counts = TextQueries.termCountsAgg(
      graft.Tables(spark, TestSpark.sf001, "documents"))
    def estMap(w: Long): Map[String, Long] =
      TextQueries.cmEstimateAt(counts, w).collect()
        .map(r => r.getAs[String]("term") -> r.getAs[Long]("cnt_est")).toMap
    val (e16, e64) = (estMap(16L), estMap(64L))
    e16.foreach { case (t, e) =>
      assert(e64(t) <= e, s"term $t: est at w=64 (${e64(t)}) above w=16 ($e)")
    }
  }

  test("d65 counter matrix conserves total token mass in every row") {
    // each of the d rows receives every token exactly once, so each
    // row's counters sum to N — the mass-conservation invariant that
    // makes the matrix a partial aggregate (pointwise-sum merge):
    // a broken bucket expression or a dropped token breaks it.
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, TestSpark.sf001, "documents")
    val n = docs.filter(length(trim(col("text"))) > 0)
      .select(explode(graft.text.TextOps.tokens(col("text"))))
      .count()
    val perRow = TextQueries.cmCounters(docs)
      .groupBy("r").agg(sum("tot").as("mass")).collect()
    assert(perRow.length == TextQueries.cmD,
      "one counter row per hash row expected")
    perRow.foreach { r =>
      assert(r.getAs[Long]("mass") == n,
        s"row ${r.getAs[Int]("r")}: mass ${r.getAs[Long]("mass")} != $n")
    }
  }
}
