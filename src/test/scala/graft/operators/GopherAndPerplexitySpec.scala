package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-11 quality filters: d43 (Gopher-style
  * repetition rule battery) and d44 (hashed-bigram LM perplexity
  * filter, with its stateless HOF scorer — the s16 stream path). The
  * cross-engine gate proves Spark ≡ DuckDB; these specs prove the
  * operators mean what their names claim on text with known structure.
  */
class GopherAndPerplexitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("d43 fails engineered repetition and passes diverse text") {
    import spark.implicits._
    // doc 1: 30 distinct tokens — every n-gram unique, all rules pass
    // (top4_frac = 4/30 ≈ 0.13 <= 0.16 is the tightest margin);
    // doc 2: "a b" repeated 15 times — the top 2-gram alone covers the
    // whole doc and every 5/10-gram is a repeat, so every rule fails
    val diverse = (1 to 30).map(i => s"w$i").mkString(" ")
    val loop = Seq.fill(15)("a b").mkString(" ")
    val docs = Seq((1L, diverse), (2L, loop)).toDF("doc_id", "text")
    val got = TextQueries.gopherRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("gopher_pass"), r.getAs[Double]("top2_frac"),
          r.getAs[Double]("dup5_frac"))).toMap
    assert(got(1L)._1 == 1L, s"diverse doc failed the battery: ${got(1L)}")
    assert(got(1L)._3 == 0.0, "diverse doc has no duplicate 5-grams")
    assert(got(2L)._1 == 0L, s"repetition loop passed the battery: ${got(2L)}")
    assert(got(2L)._2 == 1.0,
      s"top 2-gram of the loop covers every token: ${got(2L)}")
    assert(got(2L)._3 == 1.0,
      s"every 5-gram of the loop is a repeat: ${got(2L)}")
  }

  test("d43 excludes sub-10-token documents from the battery") {
    import spark.implicits._
    val docs = Seq((1L, "only nine tokens here so no verdict at all"),
      (2L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val ids = TextQueries.gopherRules(docs).select("doc_id")
      .as[Long].collect().toSet
    assert(ids == Set(2L), s"length gate wrong: $ids")
  }

  test("native gopher kernel equals the explode+groupBy form bit-for-bit on the corpus") {
    // r14 replaced the (doc, n, gram) explode through two hash aggs
    // with one per-doc kernel call (GopherStatsExpr). Same statistics
    // by construction — gram equality is token-sequence equality in
    // both forms — re-proven here value-identically (fracs are IEEE
    // doubles: same masses, same single division) against the old
    // form rebuilt as the oracle, on the real corpus.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, dir, "documents")
    val toks = docs
      .filter(length(trim($"text")) > 0)
      .select($"doc_id", graft.text.TextOps.tokens($"text").as("toks"))
      .filter(size($"toks") >= 10)
    val grams = toks.select($"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        explode(expr(
          "flatten(transform(array(2, 3, 4, 5, 10), n -> " +
            "transform(sequence(0, size(toks) - n), " +
            "i -> named_struct('n', n, 'gram', " +
            "concat_ws(' ', slice(toks, i + 1, n))))))")).as("g"))
      .select($"doc_id", $"n_tokens", $"g.n".as("n"), $"g.gram".as("gram"))
    val perN = grams
      .groupBy($"doc_id", $"n_tokens", $"n", $"gram")
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id", $"n_tokens", $"n")
      .agg(max($"c").as("max_c"),
        sum(when($"c" > 1, $"c").otherwise(0L)).as("dup_occ"),
        sum($"c").as("tot"))
    def topFrac(n: Int) =
      ((max(when($"n" === n, $"max_c")) * n).cast("double") / $"n_tokens")
        .as(s"top${n}_frac")
    def dupFrac(n: Int) =
      (max(when($"n" === n, $"dup_occ")).cast("double") /
        max(when($"n" === n, $"tot"))).as(s"dup${n}_frac")
    val oldForm = perN.groupBy($"doc_id", $"n_tokens")
      .agg(topFrac(2), topFrac(3), topFrac(4), dupFrac(5), dupFrac(10))
      .withColumn("gopher_pass",
        ($"top2_frac" <= 0.20 && $"top3_frac" <= 0.18 &&
          $"top4_frac" <= 0.16 && $"dup5_frac" <= 0.15 &&
          $"dup10_frac" <= 0.10).cast("long"))
      .collect().map(_.toString).sorted.toSeq
    val got = TextQueries.gopherRules(docs)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == oldForm,
      s"native battery diverges from the explode form: " +
        s"${got.zip(oldForm).find(p => p._1 != p._2)}")
  }

  test("d43 battery is one projection: no Exchange, no Generate (scale pin)") {
    val p = Catalog.queries("d43_gopher_rules")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"gopher battery shuffles:\n$p")
    assert(!p.contains("Generate"), s"gopher battery explodes:\n$p")
  }

  test("d76 pins the single-class corpus to NULL auc (divide guard, ADVICE r13)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // every doc diverse → every gopher verdict is PASS → n_neg = 0 →
    // AUC undefined; the guard must emit NULL (not an engine-specific
    // divide-by-zero artifact) in exactly this regime
    val docs = (1L to 4L).map(id =>
      (id, (1 to 30).map(i => s"w${id}x$i").mkString(" ")))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-d76-degenerate").toFile
    tmp.deleteOnExit()
    docs.toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("src0").as("source"), length($"text").cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${tmp.getAbsolutePath}/documents.parquet")
    val row = Catalog.queries("d76_quality_auc")(spark, tmp.getAbsolutePath)
      .collect().head
    val (nPos, nNeg) = (row.getAs[Long]("n_pos"), row.getAs[Long]("n_neg"))
    assert(nPos + nNeg > 0 && (nPos == 0L || nNeg == 0L),
      s"fixture is not single-class: pos=$nPos neg=$nNeg")
    assert(row.isNullAt(row.fieldIndex("auc_ppm")),
      s"degenerate AUC must be NULL, got ${row.get(row.fieldIndex("auc_ppm"))}")
  }

  test("d44 wsum arithmetic matches hand computation under constant LM arrays") {
    import spark.implicits._
    // constant arrays make the bucket hash irrelevant: every bigram
    // position contributes lnc − lnd = 5 − 2 = 3 micro-nats exactly
    val docs = Seq((7L, "x y z")).toDF("doc_id", "text")
    val row = TextQueries.perplexityScoreStateless(docs,
      Array.fill(16)(5L), Array.fill(16)(2L)).collect().head
    assert(row.getAs[Long]("n_bigrams") == 2L)
    assert(row.getAs[Double]("logp_mean") == 6L / 1e6 / 2L)
    assert(row.getAs[Long]("keep") == 1L,
      "positive wsum must clear the negative threshold")
  }

  test("d44 LM scores in-distribution text above out-of-vocabulary text") {
    import spark.implicits._
    // the CCNet point: a doc written in the corpus's own vocabulary
    // must carry higher mean log-probability than gibberish whose
    // grams land in (mostly) empty buckets
    val (lnc, lnd) = TextQueries.bigramLmIndex(spark, dir)
    assert(lnc.length == 4096 && lnd.length == 4096)
    val corpusText = graft.Tables(spark, dir, "documents")
      .orderBy($"doc_id").select($"text").as[String].first()
    val gibberish = (1 to 40).map(i => s"zzqxv$i").mkString(" ")
    val scored = TextQueries.perplexityScoreStateless(
      Seq((1L, corpusText), (2L, gibberish)).toDF("doc_id", "text"),
      lnc, lnd).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logp_mean")).toMap
    assert(scored(1L) > scored(2L),
      s"in-distribution ${scored(1L)} not above gibberish ${scored(2L)}")
  }

  test("d44 scorer is a stateless projection (the s16 stream contract)") {
    // no Exchange, no Generate: the scorer must lift onto a document
    // readStream unchanged, which is only true if it never shuffles or
    // explodes (the d38/s13 discipline)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (lnc, lnd) = TextQueries.bigramLmIndex(spark, dir)
      val p = TextQueries.perplexityScoreStateless(
        graft.Tables(spark, dir, "documents"), lnc, lnd)
        .queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"scorer shuffles:\n$p")
      assert(!p.contains("Generate"), s"scorer explodes:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
