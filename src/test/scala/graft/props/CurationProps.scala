package graft.props

import graft.TestSpark
import graft.operators.TextQueries
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property tests for the r15 curation operators, against PURE Scala
  * references (not fixed examples): the d86 column encoder must equal
  * a plain canonical greedy BPE encode on arbitrary words and merge
  * tables, d85 must recover synthesized paragraph text byte-exactly,
  * and d87 must redact exactly the planted keys. Each evaluation
  * batches a whole word/doc list through ONE small Spark job, so the
  * suite stays seconds-cheap despite the session dependency.
  */
object CurationProps extends Properties("graft.curation") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark

  // ---- d86 vs the pure canonical greedy encode ----
  // reference: per merge in rank order, ONE left-to-right
  // non-overlapping sweep over the symbol cells (further sweeps of the
  // same merge cannot fire: leftover singles in a run are never
  // adjacent to another single, and later merges cannot re-create an
  // earlier pair)
  private def refEncode(word: String, merges: Seq[String]): List[String] = {
    var syms = word.map(_.toString).toList
    for (pair <- merges) {
      val Array(a, b) = pair.split(" ", 2)
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toList
    }
    syms
  }

  // tiny alphabet on purpose: maximizes run/overlap collisions, the
  // regime where the r15 shared-fence bug lived
  private val word: Gen[String] = Gen.chooseNum(1, 12)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val sym: Gen[String] = Gen.chooseNum(1, 2)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val mergeTable: Gen[List[String]] = Gen.chooseNum(0, 5)
    .flatMap(n => Gen.listOfN(n,
      Gen.zip(sym, sym).map { case (a, b) => s"$a $b" }))

  property("d86 column encoder == pure canonical greedy encode") =
    forAll(Gen.listOfN(25, word), mergeTable) { (words0, merges) =>
      import spark.implicits._
      val words = words0.distinct
      val v0 = words.toDF("term")
        .select(col("term"),
          regexp_replace(col("term"), "(.)", " $1 ").as("syms"))
      val got = TextQueries.bpeEncodeSyms(v0,
          merges.zipWithIndex.map { case (p, i) =>
            (i.toLong, p, 0L, p.replace(" ", "")) })
        .collect()
        .map(r => r.getString(0) -> r.getString(1).trim.split("  ").toList)
        .toMap
      words.forall(w => got(w) == refEncode(w, merges))
    }

  // ---- d85 paragraph round-trip ----
  private val wordLower: Gen[String] = Gen.chooseNum(3, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  // >= 5 words of >= 3 chars => every '<p>' block clears the 20-char
  // floor, and lowercase letters can't collide with chrome markup
  private val sentence: Gen[String] = Gen.chooseNum(5, 8)
    .flatMap(n => Gen.listOfN(n, wordLower).map(_.mkString(" ")))

  property("d85 recovers synthesized paragraph text byte-exactly") =
    forAll(Gen.listOfN(8, Gen.zip(Gen.chooseNum(1L, 1000000L),
      Gen.chooseNum(1, 4).flatMap(k => Gen.listOfN(k, sentence))))) { docs0 =>
      import spark.implicits._
      val docs = docs0.groupBy(_._1).map(_._2.head).toSeq
        .map { case (id, sents) => (id, sents.mkString(". ") + ".", "web") }
      val got = TextQueries.htmlExtract(TextQueries.syntheticPages(
          docs.toDF("doc_id", "text", "source")))
        .select(col("doc_id"), col("main")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      docs.forall { case (id, text, _) =>
        got(id) == text.replace(". ", ".\n")
      }
    }

  // ---- d87 planted-key redaction ----
  private val plantedKey = "sk9A7qPb2XmZr4TtV8wQjL5nYc3H" // known-flagged
  private val tokenOrKey: Gen[String] =
    Gen.frequency(4 -> wordLower, 1 -> Gen.const(plantedKey))

  property("d87 redacts exactly the planted keys, prose intact") =
    forAll(Gen.listOfN(6, Gen.zip(Gen.chooseNum(1L, 1000000L),
      Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, tokenOrKey))))) { docs0 =>
      import spark.implicits._
      val docs = docs0.groupBy(_._1).map(_._2.head).toSeq
        .map { case (id, toks) => (id, toks, toks.mkString(" ")) }
      val got = TextQueries.secretScrub(
          docs.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text"))
        .select(col("doc_id"), col("n_redacted"), col("scrubbed")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      docs.forall { case (id, toks, _) =>
        val (n, scr) = got(id)
        n == toks.count(_ == plantedKey) &&
          scr == toks.map(t =>
            if (t == plantedKey) "[REDACTED]" else t).mkString(" ")
      }
    }
}
