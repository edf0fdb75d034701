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
}
