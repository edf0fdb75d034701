package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** d84's detection arm on PLANTED inputs. The fixture corpus contains
  * no credential-shaped tokens (the driver's oracle proves both
  * engines agree the counters are all 0), so the secret detector's
  * positive path — the reason the screen exists — is proven here on
  * documents with planted keys, plus hand-computable entropy anchors
  * for the two per-doc dials.
  */
class EntropyScreenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def screen(rows: (Long, String)*): Map[Long, (Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    TextQueries.entropyScreen(rows.toSeq.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("a planted API-key-shaped token is a flagged candidate") {
    // 28 chars drawn across upper/lower/digits — char entropy far
    // above 3.5 bits; the surrounding prose must NOT be a candidate
    val out = screen(
      (1L, "deploy token sk9A7qPb2XmZr4TtV8wQjL5nYc3H on the ci host"))
    val (_, _, nCand, nFlag, mx) = out(1L)
    assert(nCand == 1L, s"expected exactly the planted key: $out")
    assert(nFlag == 1L, s"planted key must clear 3.5 bits: $out")
    assert(mx >= 3500000L)
  }

  test("a long low-entropy token is a candidate but not flagged") {
    // candidate by shape (>=16 chars, letters+digits) but only 3
    // distinct chars -> entropy well under 3.5 bits
    val out = screen((1L, "padding aaaaaaaa1Aaaaaaaa1A tail"))
    val (_, _, nCand, nFlag, mx) = out(1L)
    assert(nCand == 1L, s"low-entropy token must still be a candidate: $out")
    assert(nFlag == 0L, s"3-distinct-char token must not be flagged: $out")
    assert(mx >= 0L && mx < 3500000L)
  }

  test("candidate shape requires length, charset, letters AND digits") {
    val out = screen(
      (1L, "internationalizationword"), // letters only -> no digit
      (2L, "12345678901234567890"), // digits only -> no letter
      (3L, "has%illegal%chars%abc123def456"), // outside the charset
      (4L, "shortA1b2"), // under 16 chars
      (5L, "Abc123def456ghi7")) // exactly 16, mixed -> candidate
    assert(out(1L)._3 == 0L && out(2L)._3 == 0L && out(3L)._3 == 0L &&
      out(4L)._3 == 0L)
    assert(out(5L)._3 == 1L)
    // no candidates -> sentinel max
    assert(out(1L)._5 == -1L)
  }

  test("char entropy anchors: uniform two-char text is exactly 1 bit") {
    // "ab" -> two classes, one char each: H = 1.000000 bits
    // "aaaa" -> one class: H = 0
    val out = screen((1L, "ab"), (2L, "aaaa"))
    assert(out(1L)._1 == 1000000L, s"H('ab') must be 1 bit: $out")
    assert(out(2L)._1 == 0L, s"H('aaaa') must be 0: $out")
  }

  test("token entropy anchors: repeated token is 0, distinct tokens are log2(n)") {
    // four identical tokens -> 0 bits; four distinct -> 2 bits
    val out = screen((1L, "x x x x"), (2L, "a b c d"))
    assert(out(1L)._2 == 0L, s"repeated-token entropy must be 0: $out")
    assert(out(2L)._2 == 2000000L, s"4 distinct tokens must be 2 bits: $out")
  }

  test("chars outside the alphabet fold into one residual class") {
    // '%' is outside the audit alphabet: "%%%%" is a single residual
    // class -> 0 bits, same as "aaaa"
    val out = screen((1L, "%%%%"), (2L, "%a%a"))
    assert(out(1L)._1 == 0L)
    assert(out(2L)._1 == 1000000L, s"residual+a split must be 1 bit: $out")
  }

  test("d87 redaction: planted key scrubbed, prose intact, whitespace canonical") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = TextQueries.secretScrub(Seq(
      (1L, "deploy token sk9A7qPb2XmZr4TtV8wQjL5nYc3H on  the\tci host"),
      (2L, "padding aaaaaaaa1Aaaaaaaa1A tail"), // candidate, low entropy
      (3L, "plain prose with no secrets at all"))
      .toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_redacted"), r.getAs[String]("scrubbed")))).toMap
    assert(out(1L)._1 == 1L)
    // the key is gone, the sentinel is in its slot, multi-space and
    // tab whitespace canonicalized to single spaces
    assert(out(1L)._2 ==
      "deploy token [REDACTED] on the ci host", s"got <${out(1L)._2}>")
    // low-entropy candidate and plain prose survive byte-exact
    assert(out(2L)._1 == 0L &&
      out(2L)._2 == "padding aaaaaaaa1Aaaaaaaa1A tail")
    assert(out(3L)._1 == 0L &&
      out(3L)._2 == "plain prose with no secrets at all")
    // apply ≡ screen: n_redacted agrees with d84's n_flagged on the
    // fixture corpus, doc for doc
    val screenN = TextQueries.entropyScreen(
      graft.Tables(spark, TestSpark.sf0001, "documents"))
      .select(col("doc_id"), col("n_flagged"))
    val scrubN = TextQueries.secretScrub(
      graft.Tables(spark, TestSpark.sf0001, "documents"))
      .select(col("doc_id"), col("n_redacted"))
    val disagree = screenN.join(scrubN, "doc_id")
      .filter(col("n_flagged") =!= col("n_redacted")).count()
    assert(disagree == 0L, s"$disagree docs where apply != screen")
  }
}
