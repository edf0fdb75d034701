package graft.operators

import graft.TestSpark
import graft.vec.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Eigen-math proof for v32 (PCA leading component): the pinned golden
  * is a constant of the fixture (partition invariance is re-proven at
  * sf0.1 by GoldenSweepSpec); this spec proves the constant is the
  * right one — the reported pair approximately satisfies Cv = λv for
  * an INDEPENDENTLY recomputed covariance, λ dominates every
  * coordinate variance (Rayleigh maximality), the loading vector is
  * unit norm, and the whole recipe is exactly partition-invariant at
  * the unit scale (the decimal-snap premise).
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb(dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", VectorOps.toDouble($"embedding").as("v"))

  // independent covariance: plain double sums over collected rows
  // (bounded at the test scale), no decimal snap, no Spark agg
  private def covOf(dir: String): (Array[Array[Double]], Int) = {
    val rows = emb(dir).select($"v").as[Seq[Double]].collect().map(_.toArray)
    val d = rows.head.length
    val n = rows.length
    val mu = new Array[Double](d)
    rows.foreach(r => (0 until d).foreach(i => mu(i) += r(i) / n))
    val c = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      (0 until d).foreach { i =>
        (0 until d).foreach { j =>
          c(i)(j) += (r(i) - mu(i)) * (r(j) - mu(j)) / n
        }
      }
    }
    (c, d)
  }

  test("v32's (λ, v) is an eigenpair of the independently recomputed covariance") {
    val out = VectorQueries.pcaOf(emb(TestSpark.sf001))
    val (c, d) = covOf(TestSpark.sf001)
    assert(out.size == d)
    val v = out.sortBy(_._1).map(_._2).toArray
    val lambda = out.head._3
    val cv = Array.tabulate(d)(i =>
      (0 until d).map(j => c(i)(j) * v(j)).sum)
    val resid = math.sqrt(
      v.indices.map(i => math.pow(cv(i) - lambda * v(i), 2)).sum)
    // residual is bounded by power-iteration convergence on a tight
    // spectrum plus the 6dp snap, not by exactness
    assert(resid <= 0.05 * lambda, s"residual $resid vs lambda $lambda")
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"loading norm $norm")
    // Rayleigh maximality: the top eigenvalue dominates every
    // coordinate variance (lambda_max >= e_i' C e_i)
    val maxDiag = (0 until d).map(i => c(i)(i)).max
    assert(lambda + 1e-4 >= maxDiag, s"lambda $lambda < max C_ii $maxDiag")
    // sign convention: the largest-|loading| component is positive
    val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
    assert(v(m) > 0, "sign convention broken")
    // var_ratio is lambda over the trace, in (0, 1]
    val ratio = out.head._4
    assert(ratio > 0 && ratio <= 1.0, s"var_ratio $ratio")
  }

  test("v33 spectrum: descending eigenvalues, near-orthogonal loadings, v32-consistent") {
    val rows = VectorQueries.gramSums(emb(TestSpark.sf001)).collect()
    val eig = VectorQueries.pcaTopK(rows, 3)
    val lambdas = eig.map(_._3)
    assert(lambdas == lambdas.sorted.reverse, s"not descending: $lambdas")
    assert(lambdas.forall(_ > 0), s"non-positive eigenvalue: $lambdas")
    // pairwise orthogonality up to power-iteration convergence on a
    // tight spectrum
    for (a <- eig; b <- eig if a._1 < b._1) {
      val dot = a._2.zip(b._2).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 0.05,
        s"components ${a._1},${b._1} not orthogonal: $dot")
    }
    // component 0 IS v32's eigenpair (same summary, same recipe)
    // v32 reports the 6dp snap of the same unsnapped lambda
    val v32 = VectorQueries.pcaFromSums(rows)
    assert(v32.head._3 ==
      math.floor(eig.head._3 * 1e6 + 0.5) / 1e6,
      "v33 comp 0 eigenvalue diverges from v32")
    // each eigenpair satisfies Cv = λv on the independent covariance
    val (c, d) = covOf(TestSpark.sf001)
    eig.foreach { case (comp, v, lambda) =>
      val cv = Array.tabulate(d)(i =>
        (0 until d).map(j => c(i)(j) * v(j)).sum)
      val resid = math.sqrt(
        v.indices.map(i => math.pow(cv(i) - lambda * v(i), 2)).sum)
      assert(resid <= 0.05 * lambda,
        s"component $comp residual $resid vs lambda $lambda")
    }
  }

  test("pca output is exactly partition-invariant (the decimal-snap premise)") {
    val e = emb(TestSpark.sf001)
    val a = VectorQueries.pcaOf(e)
    val b = VectorQueries.pcaOf(e.repartition(13))
    assert(a == b, "Gram sums leaked partial-aggregation order")
  }
}
