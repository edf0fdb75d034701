package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the contended-snapshot gate's decision logic (r20, VERDICT r19
  * next 7) in the FIRING direction — the live bench can only ever show
  * the gate passing clean runs through, so without this spec a
  * regression that never quarantines anything would be invisible. The
  * r19 postmortem's two signatures must BOTH be present: a >1.15
  * median calib-norm ratio vs the committed snapshot AND a >1.5×
  * intra-run calib spike. */
class BenchGateSpec extends AnyFunSuite {

  /** A minimal committed-snapshot JSON: 25 queries at calib-norm 1.0
    * each, committed at sf0.1. */
  private def prevJson(sf: String = "/root/testdata/sf0.1",
      n: Int = 25): String = {
    val qs = (1 to n).map(i => s""""q$i":1.0""").mkString(",")
    s"""{"metric":"total","queries_calib_norm":{$qs},"sf":"$sf"}"""
  }

  private def norms(ratio: Double, n: Int = 25): Seq[(String, Double)] =
    (1 to n).map(i => s"q$i" -> ratio)

  private val flatCalib = Seq(0.30, 0.31, 0.30, 0.32)
  private val spikedCalib = Seq(0.30, 0.31, 0.52, 0.30) // 1.73x

  test("fires when BOTH signatures agree: 1.3x median + 1.7x spike") {
    val r = Bench.quarantineReason(prevJson(), "/root/testdata/sf0.1",
      norms(1.3), spikedCalib)
    assert(r.isDefined, "gate must fire on a contended run")
    assert(r.get.contains("1.30") && r.get.contains("1.73"),
      s"reason must carry both measured signatures: ${r.get}")
  }

  test("a global slowdown WITHOUT a calib spike passes (could be a real regression)") {
    assert(Bench.quarantineReason(prevJson(), "/root/testdata/sf0.1",
      norms(1.3), flatCalib).isEmpty)
  }

  test("a calib spike WITHOUT a median shift passes (min-of-N absorbed it)") {
    assert(Bench.quarantineReason(prevJson(), "/root/testdata/sf0.1",
      norms(1.02), spikedCalib).isEmpty)
  }

  test("median is robust: half the queries 10x slower does not fire alone") {
    // 12 of 25 at 10x, 13 at 1.0 — median sits at 1.0, no quarantine
    // even with a spike: the gate keys on the SUITE-WIDE shift
    val mixed = (1 to 13).map(i => s"q$i" -> 1.0) ++
      (14 to 25).map(i => s"q$i" -> 10.0)
    assert(Bench.quarantineReason(prevJson(), "/root/testdata/sf0.1",
      mixed, spikedCalib).isEmpty)
  }

  test("different sf dir never gates (cross-scale snapshots are not comparable)") {
    assert(Bench.quarantineReason(prevJson(sf = "/root/testdata/sf0.01"),
      "/root/testdata/sf0.1", norms(1.3), spikedCalib).isEmpty)
  }

  test("fewer than 20 shared queries never gates") {
    assert(Bench.quarantineReason(prevJson(n = 10), "/root/testdata/sf0.1",
      norms(1.3, n = 10), spikedCalib).isEmpty)
  }

  test("negative (uncalibrated) entries are excluded from the median on both sides") {
    // prev has q1..q25 at 1.0; current marks 5 rows uncalibrated (-1)
    // and the remaining 20 at 1.3 — still >= 20 shared, still fires
    val cur = (1 to 5).map(i => s"q$i" -> -1.0) ++
      (6 to 25).map(i => s"q$i" -> 1.3)
    assert(Bench.quarantineReason(prevJson(), "/root/testdata/sf0.1",
      cur, spikedCalib).isDefined)
  }

  test("fails OPEN on malformed or empty previous snapshots") {
    assert(Bench.quarantineReason("not json at all", "/root/testdata/sf0.1",
      norms(1.3), spikedCalib).isEmpty)
    assert(Bench.quarantineReason("", "/root/testdata/sf0.1",
      norms(1.3), spikedCalib).isEmpty)
    assert(Bench.quarantineReason("""{"queries_calib_norm":{},"sf":"/root/testdata/sf0.1"}""",
      "/root/testdata/sf0.1", norms(1.3), spikedCalib).isEmpty)
  }

  // ---- r21: the probe-leg >2×-off-committed rerun trigger ----
  // (VERDICT r20 next 1 — replayed against the r20 driver run's two
  // wild legs, which five same-code runs contradicted)

  private val snippet =
    """{"scaling_x10":{"reps":10,"d01_dedup_exact":{"sf01_sec":0.182,""" +
      """"x10_sec":0.741,"ratio":4.08},"d91_decomp":{"ledger_read_sec_sf01":0.100,""" +
      """"compose_sec_sf01":0.664,"compose_ratio":2.76}},""" +
      """"scaling_x10_stream":{"s40_stream_dup_spans":{"sf01_sec":1.0,""" +
      """"x10_sec":5.92,"ratio":5.92,"state_rows_sf01":0}}}"""

  test("committedLegRatio parses flagship, stream and decomp legs; -1 when absent") {
    assert(Bench.committedLegRatio(snippet, "d01_dedup_exact") == 4.08)
    assert(Bench.committedLegRatio(snippet, "s40_stream_dup_spans") == 5.92)
    assert(Bench.committedLegRatio(snippet, "d91_decomp", "compose_ratio") == 2.76)
    assert(Bench.committedLegRatio(snippet, "nope") == -1.0)
    assert(Bench.committedLegRatio("garbage", "d01_dedup_exact") == -1.0)
  }

  test("legNeedsRerun fires on the r20 driver run's wild legs and not on clean ones") {
    // d91_decomp: driver committed 17.49 vs builder 2.76 — fires
    assert(Bench.legNeedsRerun(17.49, 2.76))
    // s40: driver 11.07 vs committed 5.92 (1.87×) — fires too; both
    // r20 wild legs are covered
    assert(Bench.legNeedsRerun(11.07, 5.92))
    // both directions fire
    assert(Bench.legNeedsRerun(1.0, 2.5))
    // clean ratios (the documented cross-run jitter band) don't
    assert(!Bench.legNeedsRerun(4.3, 4.08))
    assert(!Bench.legNeedsRerun(6.2, 5.92))
    // no committed reference (or a dead leg) fails closed to no-rerun
    assert(!Bench.legNeedsRerun(17.49, -1.0))
    assert(!Bench.legNeedsRerun(-1.0, 2.76))
  }
}
