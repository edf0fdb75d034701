package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Semantic guards for the BPE merge trainer (d66) beyond the
  * oracle's value-equality gate: the merge table must have the
  * structural properties any correct greedy BPE run has, independent
  * of the fixture's contents.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("d66 merge table is a well-formed greedy BPE run") {
    val rows = Catalog.queries("d66_bpe_merges")(spark, TestSpark.sf001)
      .collect().sortBy(_.getAs[Long]("step"))
    assert(rows.length == TextQueries.bpeK, "one row per merge round")
    // each round's winning count can never exceed the previous
    // round's: every pre-existing pair was <= the old max by argmax,
    // and a pair born from the merge occurs at most once per merged
    // occurrence, so it is bounded by the old max too
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("cnt") <= a.getAs[Long]("cnt"),
          s"greedy max increased: ${a.toSeq} -> ${b.toSeq}")
      case _ =>
    }
    rows.foreach { r =>
      val pair = r.getAs[String]("pair")
      assert(pair.count(_ == ' ') == 1,
        s"pair must be two space-separated symbols: '$pair'")
      assert(r.getAs[String]("merged") == pair.replace(" ", ""),
        s"merged symbol must concatenate the pair: ${r.toSeq}")
      assert(r.getAs[Long]("cnt") > 0L, s"zero-count merge: ${r.toSeq}")
    }
    // later merges may build on earlier ones (symbol growth) — if any
    // does, its halves must be previously-emitted merged symbols or
    // single chars; this pins the apply step actually rewrote the
    // vocabulary between rounds (a broken apply yields only char pairs)
    val emitted = rows.map(_.getAs[String]("merged")).toSet
    val compound = rows.flatMap(_.getAs[String]("pair").split(" "))
      .filter(_.length > 1)
    assert(compound.forall(emitted.contains),
      s"multi-char pair halves must come from earlier merges: " +
        s"${compound.mkString(",")}")
  }

  test("d67 fertility shows real compression per source") {
    // applying the learned merges must land every source strictly
    // between one token per word (full fusion) and one token per
    // CHARACTER (no merge fired): n_words <= n_tokens < n_chars.
    // The upper bound is the non-vacuity check — the trained merges
    // ('er', 'in', ...) hit every source's common words, so a broken
    // apply step (chars untouched) fails it.
    import org.apache.spark.sql.functions._
    val rows = Catalog.queries("d67_bpe_fertility")(spark, TestSpark.sf001)
      .collect()
    assert(rows.nonEmpty)
    val charTotals = graft.Tables(spark, TestSpark.sf001, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("source"),
        explode(graft.text.TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("source"))
      .agg(sum(length(col("term"))).as("n_chars"))
      .collect().map(r =>
        r.getAs[String]("source") -> r.getAs[Long]("n_chars")).toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val (w, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"))
      assert(w > 0L && t >= w, s"$src: n_tokens $t below n_words $w")
      assert(t < charTotals(src),
        s"$src: no compression over char-level ($t vs ${charTotals(src)})")
      val f = r.getAs[Double]("fertility")
      assert(f >= 1.0 && f <= charTotals(src).toDouble / w,
        s"$src: fertility $f outside [1, chars/word]")
    }
  }
}
