package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** m09's one-pass ridge normal equations against an independent
  * plain-Scala solve on the same collected feature frame: the oracle
  * proves cross-engine agreement, this proves the 9-register
  * aggregate + Cramer expression implement ridge least squares
  * (λ = 1e-3 on the full diagonal) rather than something both engines
  * merely agree on. Also pins the fit's defining property: the
  * fitted plane must beat the mean-only model on squared error.
  */
class RidgeFitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def features(dir: String): Seq[(Double, Double, Double)] = {
    import spark.implicits._
    // bounded gather — a few hundred docs at the gate scale;
    // TEST-ONLY device, the engine aggregates without collecting
    TextQueries.qualityFeatureFrame(
      graft.Tables(spark, dir, "documents"))
      .select($"x1", $"x2", $"y").as[(Double, Double, Double)]
      .collect().toSeq
  }

  private def solve(f: Seq[(Double, Double, Double)]): (Double, Double, Double) = {
    val lam = 1e-3
    val ints = f.map { case (x1, x2, y) =>
      (math.floor(x1 * 1e6 + 0.5).toLong, math.floor(x2 * 1e6 + 0.5).toLong,
        math.floor(y * 1e6 + 0.5).toLong)
    }
    def s(g: ((Long, Long, Long)) => Long): Double =
      ints.map(t => BigInt(g(t))).sum.toDouble
    val n = ints.size.toDouble
    val (a00, a01, a02) = (n + lam, s(t => t._1) / 1e6, s(t => t._2) / 1e6)
    val a11 = s(t => t._1 * t._1) / 1e12 + lam
    val a12 = s(t => t._1 * t._2) / 1e12
    val a22 = s(t => t._2 * t._2) / 1e12 + lam
    val b0 = s(t => t._3) / 1e6
    val b1 = s(t => t._1 * t._3) / 1e12
    val b2 = s(t => t._2 * t._3) / 1e12
    val det = a00 * (a11 * a22 - a12 * a12) - a01 * (a01 * a22 - a12 * a02) +
      a02 * (a01 * a12 - a11 * a02)
    val d0 = b0 * (a11 * a22 - a12 * a12) - a01 * (b1 * a22 - a12 * b2) +
      a02 * (b1 * a12 - a11 * b2)
    val d1 = a00 * (b1 * a22 - a12 * b2) - b0 * (a01 * a22 - a12 * a02) +
      a02 * (a01 * b2 - b1 * a02)
    val d2 = a00 * (a11 * b2 - b1 * a12) - a01 * (a01 * b2 - b1 * a02) +
      b0 * (a01 * a12 - a11 * a02)
    (d0 / det, d1 / det, d2 / det)
  }

  test("m09 equals an independent normal-equations solve at sf0.001") {
    import spark.implicits._
    val dir = TestSpark.sf0001
    val got = Catalog.queries("m09_ridge_fit")(spark, dir)
      .select($"n_docs", $"b0_micro", $"b1_micro", $"b2_micro")
      .as[(Long, Long, Long, Long)].collect().head
    val f = features(dir)
    val (e0, e1, e2) = solve(f)
    assert(got._1 == f.size.toLong)
    // the replay folds doubles in a different order than the engines'
    // shared expression string, so compare at the snap grain ±1 ulp
    // of the micro unit
    def close(g: Long, e: Double) =
      math.abs(g - math.floor(e * 1e6 + 0.5)) <= 1
    assert(close(got._2, e0) && close(got._3, e1) && close(got._4, e2),
      s"coefficients diverge: got $got want ($e0, $e1, $e2)")
  }

  test("the fitted plane beats the mean-only model on squared error") {
    val f = features(TestSpark.sf0001)
    val (b0, b1, b2) = solve(f)
    val mean = f.map(_._3).sum / f.size
    val ssePlane = f.map { case (x1, x2, y) =>
      val e = y - (b0 + b1 * x1 + b2 * x2); e * e
    }.sum
    val sseMean = f.map { case (_, _, y) => val e = y - mean; e * e }.sum
    assert(ssePlane < sseMean,
      s"fit explains nothing: sse=$ssePlane vs mean-only $sseMean")
  }
}
