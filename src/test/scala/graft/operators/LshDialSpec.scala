package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Theorems for d73 (MinHash LSH S-curve dial audit). The cross-engine
  * values are the driver's DuckDB gate; this spec pins the structural
  * laws the audit's design rests on:
  *
  *  - NESTED CONTAINMENT: the four (bands, rows) splits are nested
  *    powers of two over the same 16-slot signature, so a matching
  *    r-slot band contains matching r/2-slot sub-bands — captured
  *    pairs shrink monotonically from r=1 to r=8, in every Jaccard
  *    decile (the d68 nested-widths doctrine applied to banding).
  *  - S-CURVE DIRECTION: within a config, high-Jaccard deciles are
  *    captured at least as often as the lowest populated decile.
  *  - LEDGER CONSISTENCY: counts are internally consistent and the
  *    ppm column is exactly the floor-div of its operands.
  */
class LshDialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows: Seq[(Long, Long, Long, Long, Long, Long)] =
    Catalog.queries("d73_lsh_dial_curve")(spark, TestSpark.sf001)
      .select($"bands", $"rows_per_band", $"jbin", $"n_pairs",
        $"n_captured", $"capture_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("audit is non-vacuous: all four configs report, several deciles populated") {
    assert(rows.map(_._1).distinct.sorted == Seq(2L, 4L, 8L, 16L))
    assert(rows.map(_._3).distinct.size >= 3, "needs a spread of deciles")
    assert(rows.exists(r => r._5 > 0 && r._5 < r._4),
      "every decile fully captured or fully missed — dial audit is vacuous")
  }

  test("ledger consistency: captured <= pairs, ppm is the exact floor-div") {
    rows.foreach { case (b, r, jb, np, nc, ppm) =>
      assert(nc >= 0 && nc <= np, s"impossible counts at ($b,$r,$jb)")
      assert(ppm == nc * 1000000L / np, s"ppm mismatch at ($b,$r,$jb)")
      assert(jb >= 0 && jb <= 10)
    }
  }

  test("nested containment: per decile, capture is non-increasing in rows-per-band") {
    val byBin = rows.groupBy(_._3)
    byBin.foreach { case (jb, rs) =>
      val byR = rs.map(r => r._2 -> r._5).toMap
      // every config reports every populated decile (same exact side)
      assert(byR.keySet == Set(1L, 2L, 4L, 8L), s"decile $jb missing configs")
      assert(byR(1L) >= byR(2L) && byR(2L) >= byR(4L) && byR(4L) >= byR(8L),
        s"containment theorem broken at decile $jb: $byR")
    }
  }

  test("s-curve direction: top populated decile captures at least the bottom one") {
    rows.groupBy(_._1).foreach { case (b, rs) =>
      val sorted = rs.sortBy(_._3)
      val lo = sorted.head; val hi = sorted.last
      assert(hi._6 >= lo._6,
        s"config bands=$b captures low-Jaccard better than high: $lo vs $hi")
    }
  }
}
