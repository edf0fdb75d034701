package graft.sources

import java.nio.file.Files

import graft.TestSpark
import graft.ml.KMeans
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PointSourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-points").toString

  test("G2 generator is seeded-deterministic and clustered (G2)") {
    val (means, pts, centers) = PointSources.gaussianPoints(
      seed = 42L, numPoints = 300, k = 3, d = 2)
    val (means2, pts2, _) = PointSources.gaussianPoints(
      seed = 42L, numPoints = 300, k = 3, d = 2)
    assert(pts.map(_.toSeq).toSeq == pts2.map(_.toSeq).toSeq)
    assert(means.map(_.toSeq).toSeq == means2.map(_.toSeq).toSeq)
    assert(centers.length == 3 && centers.head.length == 2)
    // every point is within a few stddevs of its round-robin mean
    val absStd = 0.07 * 100.0
    pts.zipWithIndex.foreach { case (p, i) =>
      val m = means(i % 3)
      val dist = math.sqrt(p.zip(m).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(dist < 6 * absStd * math.sqrt(2), s"point $i too far: $dist")
    }
  }

  test("S5 delimited point scan round-trips the G2 fixture (S5/G2/S8)") {
    val dir = tmpDir()
    PointSources.writeKMeansFixture(dir, seed = 7L, numPoints = 120, k = 4, d = 3)
    val df = PointSources.points(spark, s"$dir/points", d = 3)
    assert(df.count() == 120)
    // values parse back exactly (text round-trip of toString doubles)
    val (_, pts, _) = PointSources.gaussianPoints(7L, 120, 4, 3)
    val got = df.select(sum(expr("aggregate(v, cast(0.0 as double), (a, x) -> a + x)")))
      .as[Double].head()
    val want = pts.map(_.sum).sum
    assert(math.abs(got - want) < 1e-6, s"$got vs $want")
  }

  test("S5 strict mode rejects bad-arity lines; lenient drops them (S5)") {
    val dir = tmpDir()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad"),
      "1.0 2.0\n3.0\n4.0 5.0\n".getBytes)
    assert(PointSources.points(spark, s"$dir/bad", d = 2, strict = false)
      .count() == 2)
    // count() would prune the projection away; collect() evaluates it
    val e = intercept[Exception] {
      PointSources.points(spark, s"$dir/bad", d = 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("centroid file parse: id + d values (S5)") {
    val dir = tmpDir()
    PointSources.writeKMeansFixture(dir, seed = 7L, numPoints = 10, k = 4, d = 3)
    val c = PointSources.centroids(spark, s"$dir/centers", d = 3)
      .orderBy($"cid").collect()
    assert(c.map(_.getAs[Int]("cid")).toSeq == Seq(1, 2, 3, 4))
    assert(c.forall(_.getAs[scala.collection.Seq[Double]]("v").size == 3))
  }

  test("S4 whole-file matrix scan parses rows x cols with blank lines (S4)") {
    val dir = tmpDir()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/m.txt"),
      "1.0 2.0 3.0\n\n4.0 5.0 6.0\n".getBytes)
    val block = PointSources.wholeFileMatrix(spark, s"$dir/m.txt", rows = 2,
      cols = 3).head()
    assert(block.blockRows == 2 && block.matrixCols == 3)
    assert(block.data.toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("K1 text sink writes space-separated lines readable by S5 (K1)") {
    val dir = tmpDir()
    val df = Seq((1.0, 2.0), (3.0, 4.0)).toDF("x", "y")
    PointSources.writeText(df, s"$dir/out", singleFile = true)
    val back = PointSources.points(spark, s"$dir/out", d = 2)
    assert(back.count() == 2)
    assert(back.select(sum(element_at($"v", 1))).as[Double].head() == 4.0)
  }

  test("G2 -> S5 -> KMeans end-to-end recovers the cluster means (I1/N5/N6)") {
    val dir = tmpDir()
    val k = 3; val d = 2
    PointSources.writeKMeansFixture(dir, seed = 11L, numPoints = 300, k = k,
      d = d, stddev = 0.01)
    val (means, _, _) = PointSources.gaussianPoints(11L, 300, k, d, stddev = 0.01)
    val pts = PointSources.points(spark, s"$dir/points", d = d)
    // init from the true means perturbed: here just the first k points
    val init = pts.limit(k).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("v").toArray)
    val model = KMeans.fit(pts, init, maxIter = 10, tol = 1e-9)
    // every true mean has a recovered centroid within 3*absStd
    means.foreach { m =>
      val best = model.centroids.map { c =>
        math.sqrt(c.zip(m).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.min
      assert(best < 3 * 0.01 * 100.0, s"mean ${m.toSeq} unrecovered: $best")
    }
  }
}
