package graft.cli

import java.nio.file.Files

import graft.TestSpark
import graft.sources.PointSources
import org.scalatest.funsuite.AnyFunSuite

/** The reference-compatible CLI entry points, invoked in-JVM with the
  * same flag conventions as the reference jobs.
  */
class CliMainsSpec extends AnyFunSuite {
  // the mains call SparkSession.builder().getOrCreate(); ensure the
  // shared test session exists first so they reuse it instead of
  // building (and then stopping) their own context
  private lazy val spark = TestSpark.spark

  test("KMeansMain runs the reference CLI flow end to end") {
    spark // force init
    val dir = Files.createTempDirectory("graft-cli-km").toString
    PointSources.writeKMeansFixture(dir, seed = 3L, numPoints = 200, k = 3,
      d = 2, stddev = 0.02)
    graft.ml.KMeansMain.main(Array(
      "--points", s"$dir/points",
      "--centroids", s"$dir/centers",
      "--iterations", "5",
      "--output", s"$dir/out"))
    val out = PointSources.centroids(spark, s"$dir/out", d = 2).collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Int]("cid")).sorted.toSeq == Seq(1, 2, 3))
  }

  test("MatrixMultiplyMain generates, multiplies, and self-checks (-t)") {
    spark
    val dir = Files.createTempDirectory("graft-cli-mm").toString
    graft.mm.MatrixMultiplyMain.main(Array(
      "-n", "50", "-m", "20", "-p", "6",
      "-i", s"$dir/a.bin", "-o", s"$dir/c.bin", "-t"))
    val c = graft.mm.MatrixIO.readDoubleSlice(s"$dir/c.bin", 6, 0, 50,
      bigEndian = true)
    assert(c.length == 300 && c.forall(v => !v.isNaN))
  }
}
