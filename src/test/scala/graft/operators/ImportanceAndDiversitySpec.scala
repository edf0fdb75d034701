package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the data-selection additions: d39 (DSIR-shaped
  * importance resampling), its stateless HOF twin (the s14 stream
  * path), v19 (density-equalized diversity sampling) and d40
  * (tokenizer fertility audit). The cross-engine gate proves
  * Spark ≡ DuckDB; these specs prove the operators mean what their
  * names claim on a corpus with known structure.
  */
class ImportanceAndDiversitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("d39 stateless HOF scorer is value-identical to the join-form gate path") {
    // the contract that lets s14 ship the llr table as a literal: the
    // no-shuffle scorer must reproduce the distributed join form
    // bit-for-bit (integer micro-nat sums make both order-independent)
    val joined = Catalog.queries("d39_importance_resample")(spark, dir)
    val llr = TextQueries.irLlrArray(spark, dir)
    assert(llr.length == 4096, s"llr array size ${llr.length}")
    val stateless = TextQueries.importanceScoreStateless(
      graft.Tables(spark, dir, "documents"), llr, TextQueries.irBuckets)
    assert(joined.exceptAll(stateless).isEmpty, "join-form rows missing from stateless")
    assert(stateless.exceptAll(joined).isEmpty, "stateless rows missing from join-form")
  }

  test("d39 weights documents toward the target language") {
    // the DSIR point: under a lang='en' target distribution, en
    // documents must carry higher mean log importance weight than
    // every other language's documents
    import spark.implicits._
    val scored = Catalog.queries("d39_importance_resample")(spark, dir)
    val byLang = scored.join(graft.Tables(spark, dir, "documents"), "doc_id")
      .groupBy($"lang").agg(org.apache.spark.sql.functions.avg($"logw").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = byLang.filterNot(_._1 == "en").values
    assert(others.nonEmpty, "fixture lost its non-en languages")
    assert(others.forall(_ < byLang("en")),
      s"en mean logw ${byLang("en")} not above $byLang")
  }

  test("v19 keeps everything in sparse cells and thins dense cells toward the cap") {
    import spark.implicits._
    val r = Catalog.queries("v19_diversity_sample")(spark, dir)
      .groupBy($"bucket", $"n_bucket")
      .agg(org.apache.spark.sql.functions.sum($"keep").as("kept"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (nb, kept, n) = (row.getLong(1), row.getLong(2), row.getLong(3))
      assert(n == nb, s"cell count column disagrees with group size: $row")
      // keep prob is min(1, cap/n): sparse cells pass untouched...
      if (nb <= 16) assert(kept == nb, s"sparse cell thinned: $row")
      // ...and any decently-dense cell is actually thinned (the coins
      // are deterministic md5, so this is stable, not flaky: P[no
      // thinning] < (16/48)^48 if it were random)
      if (nb >= 3 * 16) assert(kept < nb, s"dense cell not thinned: $row")
      // expected survivors = cap; deterministic coins keep the
      // realized count in a generous 4x band around it
      if (nb > 16) assert(kept <= 4 * 16, s"cell kept far beyond cap: $row")
    }
  }

  test("d41 emits exactly topN ranked distinctive terms per source, stopwords excluded by z") {
    import spark.implicits._
    val r = Catalog.queries("d41_distinctive_terms")(spark, dir).collect()
    val bySource = r.groupBy(_.getString(0))
    val nSources = graft.Tables(spark, dir, "documents")
      .select($"source").distinct.count()
    assert(bySource.size == nSources, s"missing sources: ${bySource.size} vs $nSources")
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 5L),
        s"$src ranks not 1..5")
      // z-scored log-odds, not raw frequency: a term this distinctive
      // must be genuinely over-represented, so z > 0 for every top row
      rows.foreach(row => assert(row.getDouble(4) > 0.0,
        s"$src top term has non-positive z: $row"))
    }
    // distinctiveness is relative: the same term may top several
    // sources only if the corpus is degenerate — require some spread
    assert(r.map(_.getString(2)).distinct.length > nSources / 2,
      "top terms collapse to a handful of corpus-wide stopwords")
  }

  test("d42 tier lattice holds: an exact dup is always a bow dup; disagreement is the audit's point") {
    import spark.implicits._
    val r = Catalog.queries("d42_dedup_agreement")(spark, dir)
    // lattice: identical text => identical word set, so exact_keep=0
    // with bow_keep=1 is impossible by construction
    assert(r.filter($"exact_keep" === 0 && $"bow_keep" === 1).isEmpty,
      "exact dup kept by the bow tier — lattice violated")
    // tier labels must agree with the flag pair they summarize
    assert(r.filter(($"tier" === "unique") =!=
      ($"exact_keep" === 1 && $"bow_keep" === 1)).isEmpty, "tier/flag mismatch")
    // the fixture has word-set collisions but no exact-text dups: the
    // disagreement class (what the cheap tier leaks) must be non-empty
    val tiers = r.groupBy($"tier").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(tiers.getOrElse("reordered_dup", 0L) > 0,
      s"no reordered dups found: $tiers")
    assert(tiers.getOrElse("unique", 0L) > 0, s"no unique docs: $tiers")
  }

  test("s15 streamed diversity verdicts equal the batch v19 output") {
    // the stream ships cell sizes as a literal; same counts + same
    // deterministic coin must reproduce the batch join form exactly
    val batch = Catalog.queries("v19_diversity_sample")(spark, dir)
    val streamed = Catalog.queries("s15_stream_diversity_sample")(spark, dir)
    assert(batch.exceptAll(streamed).isEmpty, "batch rows missing from stream")
    assert(streamed.exceptAll(batch).isEmpty, "stream rows missing from batch")
  }

  test("x09 coverage manifest conserves the corpus and bounds the ratios") {
    import spark.implicits._
    val r = Catalog.queries("x09_modality_coverage")(spark, dir).collect()
    val totalDocs = graft.Tables(spark, dir, "documents").count()
    assert(r.map(_.getLong(1)).sum == totalDocs, "per-source doc counts don't conserve")
    r.foreach { row =>
      val (n, emb, cov) = (row.getLong(1), row.getLong(2),
        row.getDouble(row.fieldIndex("coverage")))
      assert(emb <= n && cov >= 0.0 && cov <= 1.0, s"bounds violated: $row")
      // an unembedded doc with tokens must contribute backlog; an
      // all-embedded source must have zero backlog
      if (emb == n) assert(row.getLong(4) == 0L, s"backlog without gap: $row")
    }
  }

  test("d40 fertility is >= 1 and the audit table is bounded by (lang x source)") {
    import spark.implicits._
    val rows = Catalog.queries("d40_token_fertility")(spark, dir).collect()
    val docs = graft.Tables(spark, dir, "documents")
    val bound = docs.select($"lang").distinct.count() *
      docs.select($"source").distinct.count()
    assert(rows.nonEmpty && rows.length <= bound,
      s"expected <= langs x sources = $bound cells, got ${rows.length}")
    rows.foreach { r =>
      val fert = r.getDouble(r.fieldIndex("fertility"))
      assert(fert >= 1.0, s"fertility below 1 (a word emits >= 1 piece): $r")
      assert(r.getLong(r.fieldIndex("subword_tokens")) >=
        r.getLong(r.fieldIndex("ws_tokens")), s"piece mass below word mass: $r")
    }
  }
}
