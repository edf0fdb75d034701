package graft.sources

import java.io.{BufferedWriter, FileWriter}

import graft.mm.DoubleMatrixBlock
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Text point/matrix sources, sinks and fixture generators (reference
  * S4/S5/S8 + G2 + K1: mm/PointInputFormat.java:44-72,
  * kmeans/PointInputFormat.java:409-428, kmeans/KMeansOriginal.java:168-172,
  * kmeans/utils/KMeansDataGenerator.java:67-136, damds/DAMDS.java:65-104).
  *
  * Spark-first translation: the reference hand-forks Flink's
  * DelimitedInputFormat to keep split-straddling lines correct (589 lines
  * of plumbing); Spark's text source already guarantees that, so S5 is
  * just `spark.read.textFile` + a split/cast projection — splittable,
  * predicate-pushdown-friendly, and parallel at any scale. S4's
  * whole-file single-matrix semantics use `wholeTextFiles` (unsplittable
  * by construction, exactly the reference's `setSpittable(false)`).
  */
object PointSources {

  /** S8: plain text-line source. */
  def textLines(spark: SparkSession, path: String): Dataset[String] =
    spark.read.textFile(path)

  /** S5: delimited point scan. Whitespace-separated doubles, one point
    * per line; lines whose arity != d are a hard error (reference throws
    * "Invalid points present", kmeans/PointInputFormat.java:423-425) or
    * are dropped when `strict=false`. Returns (v: array<double>).
    */
  def points(spark: SparkSession, path: String, d: Int,
      strict: Boolean = true): DataFrame = {
    val parsed = textLines(spark, path)
      .select(split(trim(col("value")), "\\s+").as("parts"))
    val checked =
      if (strict)
        parsed.select(when(size(col("parts")) === d, col("parts"))
          .otherwise(raise_error(lit("Invalid points present"))).as("parts"))
      else parsed.where(size(col("parts")) === d)
    checked.select(transform(col("parts"), _.cast("double")).as("v"))
  }

  /** S5 variant for centroid files: "id v0 v1 ..." lines
    * (reference centroid parse, kmeans/KMeansOriginal.java:95-105).
    */
  def centroids(spark: SparkSession, path: String, d: Int): DataFrame =
    textLines(spark, path)
      .select(split(trim(col("value")), "\\s+").as("parts"))
      .where(size(col("parts")) === d + 1)
      .select(element_at(col("parts"), 1).cast("int").as("cid"),
        transform(slice(col("parts"), 2, d), _.cast("double")).as("v"))

  /** S4: whole-file text matrix scan — the entire file is ONE matrix of
    * `rows x cols` whitespace-separated doubles (unsplittable; empty
    * lines skipped, reference mm/PointInputFormat.java:57-59). Matrices
    * that genuinely fit one task only; use `points` for big data.
    */
  def wholeFileMatrix(spark: SparkSession, path: String, rows: Int,
      cols: Int): Dataset[DoubleMatrixBlock] = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path, 1).toDS().map { case (_, text) =>
      val data = text.split("\n").iterator
        .map(_.trim).filter(_.nonEmpty)
        .flatMap(_.split("\\s+").iterator.take(cols).map(_.toDouble))
        .toArray
      require(data.length == rows * cols,
        s"matrix $path: parsed ${data.length} values, want $rows x $cols")
      DoubleMatrixBlock(0, 0, rows, rows, cols, data)
    }
  }

  /** K1: text sink. `singleFile` mirrors the reference's
    * `setParallelism(1)` final-output mode (damds/DAMDS.java:161-162);
    * leave it false for scale — a coalesce(1) funnels the job through
    * one task.
    */
  def writeText(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val cols = df.columns.map(col)
    val line = concat_ws(" ", cols.toIndexedSeq: _*).as("value")
    val out = df.select(line)
    (if (singleFile) out.coalesce(1) else out)
      .write.mode(SaveMode.Overwrite).text(path)
  }

  // ---- G2: seeded Gaussian-cluster fixture generator ----

  /** Uniform random centers in [-range/2, range/2]^d
    * (KMeansDataGenerator.uniformRandomCenters).
    */
  def uniformRandomCenters(rnd: java.util.Random, k: Int, d: Int,
      range: Double): Array[Array[Double]] = {
    val half = range / 2
    Array.fill(k, d)(rnd.nextDouble() * range - half)
  }

  /** Gaussian points round-robin around k uniform centers, the
    * reference's draw order (one java.util.Random stream: means first,
    * then d gaussians per point, then a fresh uniform draw for the
    * centers FILE — the written centers are deliberately not the data
    * means). Returns (means, points, fileCenters).
    */
  def gaussianPoints(seed: Long, numPoints: Int, k: Int, d: Int,
      stddev: Double = 0.07, range: Double = 100.0)
      : (Array[Array[Double]], Array[Array[Double]], Array[Array[Double]]) = {
    val rnd = new java.util.Random(seed)
    val absStd = stddev * range
    val means = uniformRandomCenters(rnd, k, d, range)
    val pts = Array.tabulate(numPoints) { i =>
      val c = means(i % k)
      Array.tabulate(d)(j => rnd.nextGaussian() * absStd + c(j))
    }
    val fileCenters = uniformRandomCenters(rnd, k, d, range)
    (means, pts, fileCenters)
  }

  /** Write the points + centers text files the generator CLI produces
    * (points: "v0 v1 ...", centers: "id v0 v1 ..." with ids from 1).
    */
  def writeKMeansFixture(dir: String, seed: Long, numPoints: Int, k: Int,
      d: Int, stddev: Double = 0.07, range: Double = 100.0): Unit = {
    val (_, pts, centers) = gaussianPoints(seed, numPoints, k, d, stddev, range)
    writeLines(s"$dir/points", pts.map(_.mkString(" ")))
    writeLines(s"$dir/centers",
      centers.zipWithIndex.map { case (c, i) => s"${i + 1} ${c.mkString(" ")}" })
  }

  private def writeLines(path: String, lines: Array[String]): Unit = {
    val w = new BufferedWriter(new FileWriter(path))
    try lines.foreach { l => w.write(l); w.newLine() } finally w.close()
  }
}
