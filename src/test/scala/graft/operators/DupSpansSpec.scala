package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the exact-substring-dedup family (d71/d72): the
  * suffix-array method at L-token resolution. Hand-computed fixture
  * corpus with known repeated runs, plus structural invariants on the
  * real corpus (span disjointness, coverage bounds, d71/d72
  * consistency). The cross-engine value check is the driver's DuckDB
  * oracle; these pin the algebra the oracle can't see (island merge
  * boundaries, keeper election, within-doc repeats).
  */
class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val L = 8 // must equal TextQueries.dupL

  /** Fixture corpus: a 10-token run R shared by docs 0 and 1, a fully
    * unique doc 2, and doc 3 repeating an 8-token run within itself. */
  private lazy val fixtureDir: String = {
    val r = (0 until 10).map(i => s"w$i").mkString(" ")
    val x = (0 until L).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (0L, r + " " + (0 until 12).map(i => s"u$i").mkString(" ")),
      (1L, (0 until 5).map(i => s"v$i").mkString(" ") + " " + r +
        " v5 v6 v7"),
      (2L, (0 until 12).map(i => s"z$i").mkString(" ")),
      (3L, x + " y0 y1 y2 " + x))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dupspans").toString
    docs.toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("src0").as("source"), length($"text").cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dupL is the L this spec hand-computes against") {
    assert(TextQueries.dupL == L)
  }

  test("d71 finds exactly the shared and self-repeated runs, islands merged") {
    val got = Catalog.queries("d71_dup_spans")(spark, fixtureDir)
      .select($"doc_id", $"span_start", $"span_end", $"span_tokens",
        $"n_dup_grams")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // R is 10 tokens → 3 dup windows per site, merged into one span
    // covering all 10 tokens; doc 3's self-repeat gives two 8-token
    // spans (keeper semantics do NOT apply to d71 — every dup site
    // reports); doc 2 contributes nothing.
    assert(got == Set(
      (0L, 0L, 10L, 10L, 3L),
      (1L, 5L, 15L, 10L, 3L),
      (3L, 0L, 8L, 8L, 1L),
      (3L, 11L, 19L, 8L, 1L)))
  }

  test("d72 keeps first corpus occurrence and charges later sites only") {
    val got = Catalog.queries("d72_dup_span_scrub")(spark, fixtureDir)
      .select($"doc_id", $"n_tokens", $"dup_tokens", $"clean_tokens",
        $"dup_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // doc 0 owns R's first occurrence → charged nothing; doc 1 pays
    // the full 10-token cover; doc 3's second self-occurrence pays 8.
    assert(got == Set(
      (0L, 22L, 0L, 22L, 0L),
      (1L, 18L, 10L, 8L, 10000000L / 18L),
      (2L, 12L, 0L, 12L, 0L),
      (3L, 19L, 8L, 11L, 8000000L / 19L)))
  }

  test("spans are disjoint, in-bounds, and window-covered on the real corpus") {
    val docs = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet")
    val nToks = docs.filter(length(trim($"text")) > 0)
      .select($"doc_id", size(graft.text.TextOps.tokens($"text")).as("n"))
      .as[(Long, Int)].collect().toMap
    val spans = Catalog.queries("d71_dup_spans")(spark, TestSpark.sf001)
      .select($"doc_id", $"span_start", $"span_end", $"span_tokens",
        $"n_dup_grams")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(spans.nonEmpty)
    spans.foreach { case (id, s0, s1, w, g) =>
      assert(s0 >= 0 && s1 <= nToks(id), s"span out of doc bounds: $id")
      assert(w == s1 - s0 && w >= L, s"span narrower than L: $id")
      // g dup windows of length L cover at most g+L-1 and at least L
      // tokens, and never more than the span
      assert(g >= 1 && w <= g + L - 1, s"cover bound violated: $id")
    }
    // islands are maximal: within a doc, consecutive spans are
    // separated by at least one uncovered token
    spans.groupBy(_._1).values.foreach { ss =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._3, s"touching spans: $a $b")
        case _ =>
      }
    }
  }

  test("d77 dial curve: nested resolutions shrink monotonically (containment theorem)") {
    // a duplicated L-window's L/2 sub-windows are duplicated too, so
    // every metric is non-increasing as L doubles across 4 -> 8 -> 16
    // -> 32 (the fourth rung registers the containment theorem in the
    // ORACLE at every gate/sweep scale, not just this spec — VERDICT
    // r13 next 8)
    val rows = Catalog.queries("d77_dup_dial_curve")(spark, TestSpark.sf001)
      .select($"l", $"n_dup_sites", $"n_docs_hit", $"dup_tokens")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(4L, 8L, 16L, 32L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, s"sites grew with L: $a -> $b")
      assert(a._3 >= b._3, s"docs grew with L: $a -> $b")
      assert(a._4 >= b._4, s"cover grew with L: $a -> $b")
    }
    // the production dial must actually bite on the fixture
    assert(rows(1)._2 > 0, "no dup sites at the production L")
  }

  test("islands merge equals a plain-Scala reference on 200 random position sets") {
    // seeded randomized cross-check of the gaps-and-islands window
    // algebra: one DataFrame pass over 200 synthetic docs with random
    // hit positions, compared per doc against an independent interval
    // union computed in plain Scala
    val rnd = new scala.util.Random(4242)
    val docs = (0 until 200).map { id =>
      val n = 1 + rnd.nextInt(12)
      val hits = Seq.fill(n)(rnd.nextInt(60).toLong).distinct.sorted
      id.toLong -> hits
    }
    def reference(hits: Seq[Long]): Seq[(Long, Long)] = {
      // union of [p, p+L) intervals, touching intervals merged
      hits.foldLeft(List.empty[(Long, Long)]) { case (acc, p) =>
        acc match {
          case (s0, e0) :: rest if p <= e0 => (s0, math.max(e0, p + L)) :: rest
          case _ => (p, p + L) :: acc
        }
      }.reverse
    }
    val hitRows = docs.flatMap { case (id, hs) => hs.map(id -> _) }
    val got = TextQueries.dupSpansOf(
        hitRows.toDF("doc_id", "pos"))
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).sortBy(_._1).toSeq)
      .toMap
    docs.foreach { case (id, hs) =>
      assert(got.getOrElse(id, Seq.empty) == reference(hs),
        s"doc $id: ${got.getOrElse(id, Seq.empty)} vs ${reference(hs)}")
    }
  }

  test("d82 (native xxhash64 kernel) produces exactly d71's spans") {
    // spans depend only on the equality pattern of gram hashes; both
    // hashes are collision-free here, so the native path must equal
    // the md5 pipeline row for row
    val a = Catalog.queries("d71_dup_spans")(spark, TestSpark.sf001)
      .collect().map(_.toSeq).toSet
    val b = Catalog.queries("d82_dup_spans_prod")(spark, TestSpark.sf001)
      .collect().map(_.toSeq).toSet
    assert(a == b, "hash swap changed the span set")
    assert(a.nonEmpty)
  }

  test("d83 apply agrees with d72's ledger: kept = total - charged, short docs pass whole") {
    val charges = Catalog.queries("d72_dup_span_scrub")(spark, TestSpark.sf001)
      .select($"doc_id", $"n_tokens", $"dup_tokens")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val applied = Catalog.queries("d83_dup_span_apply")(spark, TestSpark.sf001)
      .select($"doc_id", $"n_tokens", $"kept_tokens")
      .as[(Long, Long, Long)].collect()
    assert(applied.nonEmpty)
    applied.foreach { case (id, n, kept) =>
      charges.get(id) match {
        case Some((n72, dup)) =>
          assert(n == n72 && kept == n - dup,
            s"doc $id: apply kept $kept, ledger says ${n - dup}")
        case None =>
          // below the gram resolution: no measurable duplication
          assert(kept == n, s"short doc $id lost tokens")
      }
    }
    assert(applied.exists { case (_, n, kept) => kept < n },
      "apply never cut anything — vacuous on this fixture?")
  }

  test("min-struct keeper election equals the row_number window form (de-skew premise)") {
    // r14 replaced the gh-partitioned row_number()/first_value windows
    // with partial-aggregable min(struct(...)) + join-back (a hot
    // gram's sites no longer funnel through one task). Same answers by
    // construction — min over the same (doc_id, pos) ordering — pinned
    // here against the old window forms on the real corpus.
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables(spark, TestSpark.sf001, "documents")
    val sites = TextQueries.gramSites(docs)
    val keeperW = Window.partitionBy($"gh").orderBy($"doc_id", $"pos")
    val windowRemovable = sites
      .withColumn("rn", row_number().over(keeperW))
      .filter($"rn" >= 2).select($"doc_id", $"pos")
      .as[(Long, Long)].collect().toSet
    val got = TextQueries.removableSites(sites)
      .as[(Long, Long)].collect().toSet
    assert(got == windowRemovable,
      s"removable sites diverge: extra=${(got -- windowRemovable).take(5)} " +
        s"missing=${(windowRemovable -- got).take(5)}")
    // and the copy-flow ledger's origin election
    val srcSites = TextQueries.gramSitesSrc(docs)
    val full = keeperW.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val windowLedger = srcSites
      .withColumn("rn", row_number().over(keeperW))
      .withColumn("ng", count(lit(1)).over(full))
      .filter($"rn" === 1 && $"ng" >= 2)
      .select($"gh", $"source", $"doc_id", $"pos")
      .as[(String, String, Long, Long)].collect().toSet
    val gotLedger = TextQueries.copyFlowLedger(spark, TestSpark.sf001)
      .select($"gh", $"src_from", $"kdoc", $"kpos")
      .as[(String, String, Long, Long)].collect().toSet
    assert(gotLedger == windowLedger, "copy-flow ledger origin election diverged")
  }

  test("d72/d78/d83 plans contain no Window over the gram hash (skew pin)") {
    // the only Window nodes allowed in the family are the per-doc
    // islands merges (partitioned by doc_id — state bounded by doc
    // length); a Window partitioned by gh cannot partial-aggregate
    // and re-introduces the hot-gram funnel
    for (q <- Seq("d72_dup_span_scrub", "d78_copy_flows", "d83_dup_span_apply")) {
      val p = Catalog.queries(q)(spark, TestSpark.sf0001)
        .queryExecution.executedPlan.toString
      val badWindows = p.linesIterator.filter(_.contains("Window "))
        .filter(_.matches(".*\\[gh#\\d+.*")).toSeq
      assert(badWindows.isEmpty,
        s"$q windows over gh:\n${badWindows.mkString("\n")}")
    }
  }

  test("d72 is consistent with d71: per-doc charge never exceeds the dup cover") {
    // d71 covers ALL dup sites, d72 only non-keeper sites — so every
    // doc's d72 charge is bounded by its d71 cover, and corpus-wide
    // at least one keeper doc is charged strictly less
    val cover = Catalog.queries("d71_dup_spans")(spark, TestSpark.sf001)
      .groupBy($"doc_id").agg(sum($"span_tokens").as("c"))
      .as[(Long, Long)].collect().toMap
    val charged = Catalog.queries("d72_dup_span_scrub")(spark, TestSpark.sf001)
      .select($"doc_id", $"dup_tokens", $"n_tokens", $"clean_tokens")
      .as[(Long, Long, Long, Long)].collect()
    charged.foreach { case (id, dup, n, clean) =>
      assert(dup <= cover.getOrElse(id, 0L), s"charge exceeds cover: $id")
      assert(clean == n - dup && dup >= 0 && dup <= n, s"ledger broken: $id")
    }
    val strictlyLess = charged.count { case (id, dup, _, _) =>
      cover.getOrElse(id, 0L) > dup }
    assert(strictlyLess > 0, "no keeper was ever spared — election broken?")
  }
}
