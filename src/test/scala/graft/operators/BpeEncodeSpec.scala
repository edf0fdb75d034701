package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** d86's encoder contract: canonical left-to-right pairing on
  * constructed run-heavy vocabularies (where the trainer's
  * shared-fence replace under-merges), decode(encode(x)) == x, and
  * re-running the whole merge chain being the identity (the
  * tokenizer's fixpoint) on the fixture vocabulary.
  */
class BpeEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def encode(words: Seq[String],
      merges: Seq[(Long, String, Long, String)]): Map[String, String] = {
    import spark.implicits._
    val v0 = words.toDF("term")
      .select(col("term"),
        regexp_replace(col("term"), "(.)", " $1 ").as("syms"))
    TextQueries.bpeEncodeSyms(v0, merges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("canonical pairing on same-symbol runs (the shared-fence failure case)") {
    val m = Seq((1L, "a a", 0L, "aa"))
    val enc = encode(Seq("aaaa", "aaa", "ba"), m)
    // one shared-fence pass gives ' aa a a '; the canonical encoder
    // must pair left-to-right: (a,a)(a,a)
    assert(enc("aaaa") == " aa  aa ")
    assert(enc("aaa") == " aa  a ")
    assert(enc("ba") == " b  a ")
  }

  test("rank-ordered merges compose (aa aa -> aaaa) and never cross cells") {
    val m = Seq((1L, "a a", 0L, "aa"), (2L, "aa aa", 0L, "aaaa"))
    val enc = encode(Seq("aaaaaaaa", "aaaaa", "baac"), m)
    assert(enc("aaaaaaaa") == " aaaa  aaaa ")
    assert(enc("aaaaa") == " aaaa  a ")
    // the 'a' tail of a merged cell must never pair with a following
    // 'a' cell: b+a merge is not in the table, so 'baac' keeps b,aa,c
    assert(enc("baac") == " b  aa  c ")
  }

  test("fixture vocabulary: chain idempotent, decode round-trips, real compression") {
    val merges = TextQueries.bpeMerges(spark, TestSpark.sf001)
    val seg = TextQueries.bpeEncodeSegmentation(spark, TestSpark.sf001, merges)
      .persist()
    try {
      // re-running the WHOLE chain is the identity => no tabled pair
      // survives the encode (the tokenizer's fixpoint)
      val again = TextQueries.bpeEncodeSyms(seg, merges)
        .withColumnRenamed("syms", "syms2")
      val moved = seg.join(again.select(col("term"), col("syms2")), "term")
        .filter(col("syms") =!= col("syms2")).count()
      assert(moved == 0L, s"$moved words not at fixpoint after the chain")
      // decode == concat cells without fences == the original word
      val broken = seg.filter(
        regexp_replace(col("syms"), " ", "") =!= col("term")).count()
      assert(broken == 0L, s"$broken words fail decode(encode(x)) == x")
      // the encoder must actually merge, and at least as much as the
      // d67 shared-fence proxy (canonical pairing never merges less)
      val nSym = seg.select(sum(size(split(trim(col("syms")), "  "))))
        .head.getLong(0)
      val proxy = TextQueries.bpeSegmentation(spark, TestSpark.sf001, merges)
        .select(sum(col("n_sym"))).head.getLong(0)
      val nChars = seg.select(sum(length(col("term")))).head.getLong(0)
      assert(nSym < nChars, "no merge fired")
      assert(nSym <= proxy, s"canonical encode ($nSym) must merge at least " +
        s"as much as the shared-fence proxy ($proxy)")
    } finally seg.unpersist()
  }
}
