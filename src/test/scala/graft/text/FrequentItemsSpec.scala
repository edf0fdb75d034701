package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Theorem gates for the Misra-Gries mergeable summary — its
  * estimates are partition-layout-dependent WITHIN the error band (so
  * no cross-engine oracle can pin values); what must hold on every
  * layout are the guarantees: c − N/(m+1) ≤ ĉ ≤ c, every term above
  * the N/(m+1) floor retained, and never more than m counters. The
  * exact d55 query is the ground truth the sketch is audited against.
  */
class FrequentItemsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // skewed synthetic stream: term i has count 3^(12-i) — a few heavy
  // terms over a long tail, the regime the sketch exists for
  private def skewed: Seq[String] =
    (0 until 12).flatMap(i => Seq.fill(math.pow(3, 12 - i).toInt)(s"t$i")) ++
      (0 until 2000).map(i => s"tail$i")

  private def exact(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("MG guarantees hold on the skewed stream for every partition layout") {
    import spark.implicits._
    val xs = skewed
    val n = xs.size.toLong
    val truth = exact(xs)
    for (parts <- Seq(1, 3, 13, 32); m <- Seq(8, 64)) {
      val sk = FrequentItems.sketch(
        spark.createDataset(xs).repartition(parts), m)
      assert(sk.size <= m, s"parts=$parts m=$m: ${sk.size} counters")
      val floor = n / (m + 1L)
      truth.foreach { case (t, c) =>
        val est = sk.getOrElse(t, 0L)
        assert(est <= c, s"parts=$parts m=$m: $t overcounted $est > $c")
        assert(est >= c - floor,
          s"parts=$parts m=$m: $t undercounted $est < ${c - floor}")
        if (c > floor)
          assert(sk.contains(t),
            s"parts=$parts m=$m: heavy term $t (c=$c > floor=$floor) dropped")
      }
    }
  }

  test("sketch with m >= vocabulary is exact, and covers d55's exact heavy hitters") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // fixture leg: the sf0.01 vocabulary fits in m=64 counters, so the
    // sketch must degenerate to exact counts — and therefore contain
    // every d55 heavy hitter with its exact count
    val docs = graft.Tables(spark, TestSpark.sf001, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .as[String]
    val sk = FrequentItems.sketch(docs, 64)
    val hh = graft.operators.Catalog
      .queries("d55_heavy_hitters")(spark, TestSpark.sf001)
      .collect()
    assert(hh.nonEmpty, "fixture assumption: heavy hitters exist at φ=1/30")
    hh.foreach { r =>
      val t = r.getAs[String]("term"); val c = r.getAs[Long]("cnt")
      assert(sk.get(t).contains(c),
        s"m>=vocab sketch must be exact: $t -> ${sk.get(t)} vs $c")
    }
  }

  test("merge preserves the additive error bound across a deep merge tree") {
    // two disjoint skewed halves merged at m=8: the merged summary's
    // error on each half's heavy term must stay within (n1+n2)/(m+1)
    val xs1 = Seq.fill(500)("a") ++ (0 until 300).map(i => s"x$i")
    val xs2 = Seq.fill(400)("b") ++ (0 until 300).map(i => s"y$i")
    val m = 8
    val merged = FrequentItems.merge(
      FrequentItems.mg(xs1.iterator, m),
      FrequentItems.mg(xs2.iterator, m), m)
    assert(merged.size <= m)
    val bound = (xs1.size + xs2.size).toLong / (m + 1L)
    assert(merged.getOrElse("a", 0L) >= 500L - bound &&
      merged.getOrElse("a", 0L) <= 500L)
    assert(merged.getOrElse("b", 0L) >= 400L - bound &&
      merged.getOrElse("b", 0L) <= 400L)
  }
}
