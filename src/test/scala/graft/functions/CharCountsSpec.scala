package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_char_counts must be value-identical to the composed
  * transform/replace form it replaced (the d84/d87 exactness premise):
  * for every input, counts(alphabet(i)) == length(s) -
  * length(replace(s, alphabet(i), '')). The byte-scan shortcut is only
  * sound because the alphabet is ASCII and UTF-8 multibyte sequences
  * never contain ASCII bytes — so the multibyte cases are the ones
  * that MUST be asserted here.
  */
class CharCountsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val alphabet =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ " +/=_-.,:;!?".toSeq).mkString
  private val arrSql =
    "array(" + alphabet.map(c => s"'$c'").mkString(",") + ")"

  private def bothForms(rows: Seq[String]): Unit = {
    import spark.implicits._
    val df = rows.toDF("s")
      .withColumn("native", expr(s"graft_char_counts(s, '$alphabet')"))
      .withColumn("composed", expr(
        s"transform($arrSql, c -> length(s) - length(replace(s, c, '')))"))
    val bad = df.filter(not($"native" <=> $"composed")).collect()
    assert(bad.isEmpty, s"counts diverge on: ${bad.mkString("; ")}")
  }

  test("equals the composed transform/replace form, incl. multibyte and edge inputs") {
    bothForms(Seq(
      "", " ", "aaa", "The quick brown fox: 42 jumps?!",
      "secret+KEY/with=shape-chars_0129,.;:!?",
      "héllo wörld — naïve façade",        // multibyte latin
      "日本語テキスト with ascii 123 mixed", // CJK + ascii
      "é世界",                 // no ascii at all
      "ábc",                          // combining mark between ascii
      ("x" * 10000) + "☃" + ("?" * 5)))
  }

  test("equals the composed form on the fixture corpus") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"text".as("s")).limit(200)
    val df = docs
      .withColumn("native", expr(s"graft_char_counts(s, '$alphabet')"))
      .withColumn("composed", expr(
        s"transform($arrSql, c -> length(s) - length(replace(s, c, '')))"))
    assert(df.filter(not($"native" <=> $"composed")).count() == 0)
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    // force the interpreted path via a fresh expression eval
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("ab=ba é 12")
    val lut = CharCountKernels.lookupFor(alphabet)
    val k = CharCountKernels.counts(s, lut, alphabet.length)
    val viaDf = Seq("ab=ba é 12").toDF("s")
      .selectExpr(s"graft_char_counts(s, '$alphabet')")
      .head.getSeq[Int](0)
    assert(viaDf == k.toSeq)
  }

  test("rejects non-ascii or duplicate alphabets") {
    intercept[IllegalArgumentException](CharCountKernels.lookupFor("abé"))
    intercept[IllegalArgumentException](CharCountKernels.lookupFor("aa"))
  }
}
