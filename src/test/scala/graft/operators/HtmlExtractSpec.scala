package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** d85's extraction contract on CONSTRUCTED pages, where the ground
  * truth is known to the byte: script/style subtrees vanish, link-dense
  * chrome (nav/sidebar/footer) is dropped, short fragments are dropped,
  * real paragraphs survive byte-exact, and entities unescape. The
  * driver's oracle gates the synthesized-fixture pipeline; this spec
  * owns the semantic claims.
  */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def extract(pages: (Long, String)*): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    TextQueries.htmlExtract(pages.toSeq.toDF("doc_id", "html"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(5))))
      .toMap
  }

  private val body1 = "This is the first real paragraph of the article body."
  private val body2 = "And a second paragraph that also clears the length floor."

  test("chrome dropped, body recovered byte-exact") {
    val html = "<html><head><title>t</title>" +
      "<style>p{color:red}</style>" +
      "<script>var boilerplate = 'should never leak';</script>" +
      "</head><body>" +
      "<nav><a href=\"/\">Home</a><a href=\"/x\">About us</a></nav>" +
      s"<div><p>$body1</p><p>$body2</p></div>" +
      "<footer><a href=\"/tos\">Terms of Service</a><a href=\"/p\">Privacy Policy</a>(c)</footer>" +
      "</body></html>"
    val (nBlocks, nKept, main) = extract((1L, html))(1L)
    assert(main == body1 + "\n" + body2, s"main was <$main>")
    assert(nKept == 2L)
    assert(nBlocks >= 4L, s"nav/footer/title must still be counted blocks: $nBlocks")
    assert(!main.contains("should never leak") && !main.contains("color:red"))
  }

  test("link-density rule: a mostly-link block drops, an anchored sentence survives") {
    // kept rule is 3*linklen < len: a paragraph citing one short link
    // survives; a block that is half links does not
    val cited = "The study was published last year and the full dataset " +
      "is available at <a href=\"/d\">this page</a> for replication."
    val linky = "<a href=\"/a\">First long link text</a> and " +
      "<a href=\"/b\">second long link text</a> glue"
    val (_, nKept, main) = extract((1L, s"<body><p>$cited</p><p>$linky</p></body>"))(1L)
    assert(nKept == 1L, s"expected only the cited sentence: <$main>")
    assert(main.contains("available at this page for replication"))
    assert(!main.contains("second long link text"))
  }

  test("short fragments drop; entities unescape in the kept content") {
    val html = "<body><h1>Too short</h1>" +
      "<p>Ben &amp; Jerry said 2 &lt; 3 &amp;&amp; &quot;yes&quot; twice.</p></body>"
    val (_, nKept, main) = extract((1L, html))(1L)
    assert(nKept == 1L)
    assert(main == "Ben & Jerry said 2 < 3 && \"yes\" twice.")
  }

  test("synthesized fixture pages: chrome never leaks, paragraphs survive") {
    val docs = graft.Tables(spark, TestSpark.sf0001, "documents")
    val out = TextQueries.htmlExtract(TextQueries.syntheticPages(docs))
    import org.apache.spark.sql.functions._
    val n = out.count()
    assert(n > 0)
    // no page keeps its nav/footer text, and every page with a kept
    // block recovered only document words (chrome tokens absent)
    assert(out.filter(col("main").contains("Cookie Settings") ||
      col("main").contains("Log in") ||
      col("main").contains("alpha stories")).count() == 0)
    // the <p>-wrapped doc text survives for docs with a long-enough body
    val kept = out.filter(col("n_kept") >= 1).count()
    assert(kept > n / 2, s"only $kept of $n pages kept any content")
  }
}
