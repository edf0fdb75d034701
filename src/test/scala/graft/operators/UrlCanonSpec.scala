package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** d90's canonicalization contract on CONSTRUCTED URLs, where the
  * ground truth is known to the byte: scheme/host case-folds (path
  * case survives), fragments vanish, default ports strip (non-default
  * ones survive), a leading www. strips, tracking params drop while
  * real params survive in order, `utmX` (no underscore) is NOT a
  * tracking prefix, and one trailing slash strips off non-root paths
  * only. The driver's oracle gates the synthesized-fixture pipeline;
  * this spec owns the semantic claims.
  */
class UrlCanonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    val in = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
    TextQueries.urlCanonCols(in)
      .orderBy("doc_id").select("canon").collect().map(_.getString(0)).toSeq
  }

  test("scheme and host case-fold; path case survives") {
    assert(canon("HTTPS://Example.COM/Articles/One") ==
      Seq("https://example.com/Articles/One"))
  }

  test("fragment strips") {
    assert(canon("https://example.com/a#sec-2", "https://example.com/a#") ==
      Seq("https://example.com/a", "https://example.com/a"))
  }

  test("default ports strip; non-default ports survive") {
    assert(canon(
      "https://example.com:443/a",
      "http://example.com:80/a",
      "https://example.com:8443/a",
      "http://example.com:443/a") == Seq(
      "https://example.com/a",
      "http://example.com/a",
      "https://example.com:8443/a",
      // :443 is NOT http's default — it must survive
      "http://example.com:443/a"))
  }

  test("leading www. strips; inner www survives") {
    assert(canon("https://www.example.com/a", "https://wwwx.example.com/a",
      "https://sub.www.example.com/a") == Seq(
      "https://example.com/a", "https://wwwx.example.com/a",
      "https://sub.www.example.com/a"))
  }

  test("tracking params drop, real params survive in original order") {
    assert(canon(
      "https://example.com/a?utm_source=f&id=9&utm_campaign=c&page=2",
      "https://example.com/a?fbclid=x&gclid=y&ref=z",
      "https://example.com/a?utmx=keepme") == Seq(
      "https://example.com/a?id=9&page=2",
      "https://example.com/a",
      // utmx has no underscore — 'utm_' prefix must not LIKE-match it
      "https://example.com/a?utmx=keepme"))
  }

  test("trailing slash strips on non-root paths only") {
    assert(canon("https://example.com/a/", "https://example.com/") ==
      Seq("https://example.com/a", "https://example.com/"))
  }

  test("everything at once") {
    assert(canon(
      "HTTPS://WWW.Site.ORG:443/News/Today/?utm_medium=social&q=rain#top") ==
      Seq("https://site.org/News/Today?q=rain"))
  }

  test("fixture canon is never null or empty (the non-null pin is real)") {
    // ADVICE r18: the never-firing coalesce(canon, '') exists only to
    // make the column non-nullable (it blocks the isnotnull-inference
    // chain-inlining blowup, BENCH_NOTES r18/d90) — but it also changes
    // NULL-canon semantics from "row drops out of the keeper equi-join"
    // to "all NULL rows merge under one '' keeper group". This pin makes
    // a future null- or empty-producing input fail LOUDLY here instead
    // of silently merging a dup group.
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, graft.TestSpark.sf001, "documents")
    val bad = TextQueries.urlCanonCols(TextQueries.syntheticUrls(docs))
      .filter(col("canon").isNull || col("canon") === "").count()
    assert(bad == 0L, "urlCanonCols produced null/empty canon on the fixture")
  }

  test("synthesized variants 0-2 collide within a source; variant 3 stays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // docs k, k+20, k+40, k+60 share source and article group
    val docs = Seq(
      (80L, "src0", "x"), (100L, "src0", "x"),
      (120L, "src0", "x"), (140L, "src0", "x"))
      .toDF("doc_id", "source", "text")
    val canons = TextQueries.urlCanonCols(TextQueries.syntheticUrls(docs))
      .select(col("doc_id"), col("canon")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(canons(80L) == "https://src0.example.com/articles/1")
    assert(canons(100L) == canons(80L), "variant 1 must canonicalize to 0")
    assert(canons(120L) == canons(80L), "variant 2 must canonicalize to 0")
    assert(canons(140L) ==
      "http://src0.example.com/articles/1?id=0",
      "variant 3 keeps its real ?id param and http scheme")
  }
}
