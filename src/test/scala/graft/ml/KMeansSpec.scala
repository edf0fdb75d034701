package graft.ml

import graft.TestSpark
import graft.vec.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def points() = {
    import spark.implicits._
    spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select($"vec_id", VectorOps.toDouble($"embedding").as("v"))
  }

  /** Naive driver-side Lloyd loop — the reference-loop oracle. */
  private def naiveKMeans(pts: Array[Array[Double]],
      init: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    var cents = init.map(_.clone())
    for (_ <- 1 to iters) {
      val k = cents.length
      val d = cents(0).length
      val sums = Array.fill(k, d)(0.0)
      val counts = new Array[Long](k)
      pts.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        for (c <- 0 until k) {
          var s = 0.0
          for (j <- 0 until d) { val t = p(j) - cents(c)(j); s += t * t }
          if (s < bestD) { bestD = s; best = c }
        }
        counts(best) += 1
        for (j <- 0 until d) sums(best)(j) += p(j)
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(d)(j => sums(c)(j) / counts(c)))
    }
    cents
  }

  test("fit matches a driver-side reference loop after 5 iterations") {
    import spark.implicits._
    val df = points()
    val init = KMeans.initFromLowestIds(df, "vec_id", 4)
    val model = KMeans.fit(df, init, maxIter = 5)
    val local = df.select($"v").as[Seq[Double]].collect().map(_.toArray)
    val want = naiveKMeans(local, init, 5)
    assert(model.iters == 5)
    model.centroids.zip(want).foreach { case (g, w) =>
      g.zip(w).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"centroid drift: $a vs $b")
      }
    }
  }

  test("empty clusters keep their previous centroid (reference refill semantics)") {
    import spark.implicits._
    // all points near origin; one centroid far away gets no assignment
    val pts = Seq.tabulate(20)(i => Seq(0.01 * i, 0.0)).toDF("v")
    val far = Array(1e6, 1e6)
    val next = KMeans.step(pts, Array(Array(0.0, 0.0), far))
    assert(next(1).toSeq == far.toSeq)
    assert(next(0)(0) > 0.0) // near centroid moved to the mean
  }

  test("tol-based early exit sets converged") {
    import spark.implicits._
    val df = points()
    val init = KMeans.initFromLowestIds(df, "vec_id", 2)
    val model = KMeans.fit(df, init, maxIter = 50, tol = 1e12)
    assert(model.converged && model.iters == 1)
    val model2 = KMeans.fit(df, init, maxIter = 3, tol = 0.0)
    assert(!model2.converged && model2.iters == 3)
  }

  test("stepBlock (A5 partition pre-agg) matches step up to FP order") {
    import spark.implicits._
    val df = points()
    val init = KMeans.initFromLowestIds(df, "vec_id", 4)
    val a = KMeans.step(df, init)
    val b = KMeans.stepBlock(df, init)
    a.zip(b).foreach { case (x, y) =>
      x.zip(y).foreach { case (u, w) =>
        assert(math.abs(u - w) < 1e-9, s"$u vs $w")
      }
    }
  }

  test("stepBlock keeps empty clusters at their previous centroid (A5)") {
    import spark.implicits._
    val pts = Seq.tabulate(20)(i => Seq(0.01 * i, 0.0)).toDF("v")
    val far = Array(1e6, 1e6)
    val next = KMeans.stepBlock(pts, Array(Array(0.0, 0.0), far))
    assert(next(1).toSeq == far.toSeq)
    assert(next(0)(0) > 0.0)
  }

  test("fitLocal == fitBlock on a single partition (same update contract)") {
    import spark.implicits._
    val n = 60
    val data = Array.tabulate(n)(i =>
      Array((i * 37 % 97) / 97.0, (i * 11 % 89) / 89.0))
    val pts = data.map(_.toSeq).toSeq.toDF("v").coalesce(1)
    val init = data.take(4)
    val a = KMeans.fitLocal(data, init, maxIter = 5)
    val b = KMeans.fitBlock(pts, init, maxIter = 5)
    // one partition -> identical summation order -> exact equality
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
    assert(a.iters == b.iters && a.converged == b.converged)
  }

  test("scalableInit (k-means||) beats lowest-id seeding on clustered data") {
    import spark.implicits._
    // gaussian fixture with real cluster structure: 4 well-separated
    // means, so a cost-aware init must beat "first 4 points" seeding
    val (_, pts, _) = graft.sources.PointSources.gaussianPoints(
      seed = 7L, numPoints = 4000, k = 4, d = 2)
    val df = spark.createDataset(pts.toIndexedSeq.zipWithIndex
      .map { case (p, i) => (i.toLong, p.toSeq) })
      .toDF("vec_id", "v")
    def cost(cents: Array[Array[Double]]): Double =
      df.select(KMeans.assign($"v", cents).getField("dist2").as("d2"))
        .agg(sum($"d2")).head().getDouble(0)
    val scalable = KMeans.scalableInit(df, "vec_id", k = 4, rounds = 3)
    val lowest = KMeans.initFromLowestIds(df, "vec_id", k = 4)
    assert(scalable.length == 4)
    val (cs, cl) = (cost(scalable), cost(lowest))
    info(f"k-means|| cost $cs%.1f vs lowest-id $cl%.1f")
    assert(cs < cl, s"scalable $cs not better than lowest-id $cl")
    // determinism: a second run is bit-identical
    val again = KMeans.scalableInit(df, "vec_id", k = 4, rounds = 3)
    assert(scalable.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("scalableInit is partition-invariant (the golden-pinning premise)") {
    import spark.implicits._
    // the DECIMAL-folded total + snapped per-row costs make the
    // sampling threshold independent of partial-sum order; assert it
    // by running the same init under very different partitionings
    val base = points()
    val a = KMeans.scalableInit(base.repartition(3), "vec_id", k = 4,
      rounds = 2)
    val b = KMeans.scalableInit(base.repartition(17), "vec_id", k = 4,
      rounds = 2)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("scalableInit degrades gracefully on degenerate all-identical data") {
    import spark.implicits._
    // every point identical: round-1 total cost is 0, so sampling adds
    // nothing — the candidate pool pads from the lowest ids instead of
    // crashing the weighted reduction (initFromLowestIds parity)
    val df = spark.createDataset((0L until 50L)
      .map(i => (i, Seq(1.0, 2.0, 3.0)))).toDF("vec_id", "v")
    val init = KMeans.scalableInit(df, "vec_id", k = 4, rounds = 2)
    assert(init.length == 4)
    init.foreach(c => assert(c.toSeq == Seq(1.0, 2.0, 3.0)))
  }

  test("assignment column is deterministic argmin with cid tiebreak") {
    import spark.implicits._
    val pts = Seq(Seq(0.0, 0.0)).toDF("v")
    // two centroids at identical distance -> lower cid wins
    val a = pts.select(
      KMeans.assign($"v", Array(Array(1.0, 0.0), Array(-1.0, 0.0))).as("a"))
      .select($"a.cid").as[Int].collect()
    assert(a.toSeq == Seq(0))
  }
}
