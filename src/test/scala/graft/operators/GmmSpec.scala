package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** EM theorems for m08 (quality-score Gaussian mixture). The golden
  * pins the gate-scale values; this spec proves the fit is a real EM
  * trajectory, not a frozen accident:
  *
  *  - MONOTONE LOG-LIKELIHOOD: each EM round must not decrease the
  *    data log-likelihood (the EM convergence theorem). The recorded
  *    history is in snapped micro-nats, so the tolerance is the snap
  *    grain times the row count.
  *  - WELL-FORMED PARAMETERS: weights are a convex pair, variances
  *    respect the floor, means stay inside the observed score range.
  *  - INDEPENDENT RESPONSIBILITY CHECK: the final mixture's weights
  *    equal the mean posterior responsibilities recomputed in plain
  *    Scala over the collected scores (the M-step fixed point).
  *  - EXACT PARTITION INVARIANCE: the decimal/micro-nat snap premise
  *    — the whole trajectory is bit-identical under repartition.
  */
class GmmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val scores = MlQueries.gmmScores(spark, TestSpark.sf001)
  private lazy val hist = MlQueries.gmmFit(scores)

  test("log-likelihood is monotone non-decreasing across EM rounds") {
    val lls = hist.map(_._2)
    val n = scores.count()
    // per-row micro-nat snapping can move a round's total by at most
    // one grain per row in each direction
    val slack = 2L * n
    lls.zip(lls.tail).zipWithIndex.foreach { case ((a, b), i) =>
      assert(b >= a - slack, s"loglik dropped at round $i: $a -> $b")
    }
    assert(lls.last > lls.head, "EM never improved the likelihood")
  }

  test("final parameters are well-formed and inside the data range") {
    val p = hist.last._1
    assert(math.abs(p.w1 + p.w2 - 1.0) < 1e-9, s"weights not convex: $p")
    assert(p.w1 > 0 && p.w2 > 0, s"degenerate component: $p")
    assert(p.v1 >= 1e-5 && p.v2 >= 1e-5, s"variance under floor: $p")
    val xs = scores.as[Double].collect()
    assert(p.m1 >= xs.min && p.m1 <= xs.max, s"m1 outside data: $p")
    assert(p.m2 >= xs.min && p.m2 <= xs.max, s"m2 outside data: $p")
  }

  test("final weights equal mean posterior responsibilities (M-step fixed point)") {
    val p = hist.last._1
    val xs = scores.as[Double].collect()
    def dens(w: Double, m: Double, v: Double, x: Double) =
      w * math.exp(-(x - m) * (x - m) / (2 * v)) / math.sqrt(2 * math.Pi * v)
    val r1 = xs.map { x =>
      val f1 = dens(p.w1, p.m1, p.v1, x); val f2 = dens(p.w2, p.m2, p.v2, x)
      f1 / (f1 + f2 + 1e-300)
    }
    // near convergence the M-step is a fixed point: w1 ≈ mean r1;
    // tolerance covers the remaining EM drift plus snap error
    assert(math.abs(r1.sum / xs.length - p.w1) < 5e-3,
      s"w1 ${p.w1} vs mean responsibility ${r1.sum / xs.length}")
  }

  test("the EM trajectory is exactly partition-invariant (snap premise)") {
    val a = MlQueries.gmmFit(scores)
    val b = MlQueries.gmmFit(scores.repartition(13))
    assert(a == b, "EM statistics leaked partial-aggregation order")
  }

  test("histogram step equals the per-row distributed aggregation bit-for-bit") {
    // the single-scan premise: the driver-side histogram EM round must
    // reproduce EXACTLY what a per-row distributed decimal aggregation
    // under the same params computes (the pre-r14 m08 shape, rebuilt
    // here as the independent oracle). Run at two points on the
    // trajectory — the fixed init and a mid-fit parameter set — so
    // both the well-separated and the near-converged regimes are
    // covered.
    import org.apache.spark.sql.functions.{count, expr, lit}
    def perRowStep(p: MlQueries.GmmParams): (MlQueries.GmmParams, Long) = {
      def dens(w: Double, m: Double, v: Double) =
        s"($w * exp(-(x - $m) * (x - $m) / (2 * $v)) / sqrt(2 * pi() * $v))"
      val f1 = dens(p.w1, p.m1, p.v1)
      val f2 = dens(p.w2, p.m2, p.v2)
      val tot = s"($f1 + $f2 + 1e-300)"
      def snap(e: String) = s"cast($e as decimal(30,15))"
      val agg = scores.select(
        expr(s"sum(${snap(s"$f1 / $tot")})").as("r1"),
        expr(s"sum(${snap(s"$f1 / $tot * x")})").as("s1"),
        expr(s"sum(${snap(s"$f1 / $tot * x * x")})").as("q1"),
        expr(s"sum(${snap(s"$f2 / $tot")})").as("r2"),
        expr(s"sum(${snap(s"$f2 / $tot * x")})").as("s2"),
        expr(s"sum(${snap(s"$f2 / $tot * x * x")})").as("q2"),
        expr(s"sum(cast(floor(ln($tot) * 1e6 + 0.5) as bigint))").as("ll"),
        count(lit(1)).as("n")).head()
      def d(i: Int) = agg.getDecimal(i).doubleValue()
      val n = agg.getLong(7).toDouble
      def m(su: Double, r: Double) = su / r
      def v(qu: Double, su: Double, r: Double) =
        math.max(qu / r - (su / r) * (su / r), 1e-5)
      (MlQueries.GmmParams(d(0) / n, m(d(1), d(0)), v(d(2), d(1), d(0)),
        d(3) / n, m(d(4), d(3)), v(d(5), d(4), d(3))), agg.getLong(6))
    }
    val h = MlQueries.gmmHistogram(scores)
    for (p <- Seq(hist.head._1, hist(hist.size / 2)._1)) {
      val fast = MlQueries.gmmStepHist(h, p)
      val slow = perRowStep(p)
      assert(fast == slow,
        s"histogram EM round diverged from the per-row form at $p:\n" +
          s"  hist:   $fast\n  perRow: $slow")
    }
  }

  test("chunk-parallel histogram fold is bit-identical to the sequential fold") {
    // gmmStepHist folds the histogram in parallel chunks (decimal
    // addition is exact, hence associative — the x10-superlinearity
    // fix), but the parallel path only engages past 1024 rows and the
    // gate-scale fixture histogram sits below that; this leg builds a
    // synthetic 100k-row histogram (6dp-snapped xs, the production
    // domain) and replays the ORIGINAL sequential left fold
    // independently, pinning chunked == sequential bit-for-bit.
    import java.math.{BigDecimal => JBD, RoundingMode}
    val rnd = new scala.util.Random(7)
    val h = Array.tabulate(100000)(_ =>
      (math.rint((rnd.nextDouble() - 0.5) * 1e6) / 1e6,
        (rnd.nextInt(5) + 1).toLong))
    val p = MlQueries.GmmParams(0.5, -0.05, 0.0025, 0.5, 0.05, 0.0025)
    def snap(d: Double): JBD =
      new JBD(java.lang.Double.toString(d)).setScale(15, RoundingMode.HALF_UP)
    def dens(w: Double, m: Double, v: Double, x: Double): Double =
      w * math.exp(-(x - m) * (x - m) / (2 * v)) / math.sqrt(2 * math.Pi * v)
    var (r1, s1, q1) = (JBD.ZERO, JBD.ZERO, JBD.ZERO)
    var (r2, s2, q2) = (JBD.ZERO, JBD.ZERO, JBD.ZERO)
    var ll = 0L; var n = 0L
    h.foreach { case (x, cnt) =>
      val f1 = dens(p.w1, p.m1, p.v1, x)
      val f2 = dens(p.w2, p.m2, p.v2, x)
      val tot = f1 + f2 + 1e-300
      val c = JBD.valueOf(cnt)
      r1 = r1.add(snap(f1 / tot).multiply(c))
      s1 = s1.add(snap(f1 / tot * x).multiply(c))
      q1 = q1.add(snap(f1 / tot * x * x).multiply(c))
      r2 = r2.add(snap(f2 / tot).multiply(c))
      s2 = s2.add(snap(f2 / tot * x).multiply(c))
      q2 = q2.add(snap(f2 / tot * x * x).multiply(c))
      ll += cnt * math.floor(math.log(tot) * 1e6 + 0.5).toLong
      n += cnt
    }
    val nd = n.toDouble
    def m(su: JBD, r: JBD) = su.doubleValue() / r.doubleValue()
    def v(qu: JBD, su: JBD, r: JBD) = {
      val (q, s, rr) = (qu.doubleValue(), su.doubleValue(), r.doubleValue())
      math.max(q / rr - (s / rr) * (s / rr), 1e-5)
    }
    val seq = (MlQueries.GmmParams(
      r1.doubleValue() / nd, m(s1, r1), v(q1, s1, r1),
      r2.doubleValue() / nd, m(s2, r2), v(q2, s2, r2)), ll)
    val par = MlQueries.gmmStepHist(h, p)
    assert(par == seq,
      s"chunk-parallel fold diverged from sequential:\n  par: $par\n  seq: $seq")
  }
}
