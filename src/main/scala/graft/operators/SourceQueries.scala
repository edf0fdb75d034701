package graft.operators

import graft.sources.PointSources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle rows for the text source/sink family (previously spec-only):
  * formula-defined data goes out through the real sinks and back in
  * through the real scans, and DuckDB recomputes the formula — so the
  * writer formatting, the line parsing, the arity check and the
  * whole-file matrix assembly are all under the correctness gate.
  * Double→text→double is exact (Java shortest-roundtrip formatting on
  * the write side, exact parse on the scan side).
  */
object SourceQueries {

  private val nPts = 500

  // ---- p01: K1 text sink → S8 line source → S5 point scan ----
  private def p01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-points").toString
    val pts = s.range(nPts).select(
      (($"id" * 37 % 1000) / 1000.0).as("x"),
      (($"id" * 11 % 1000) / 1000.0).as("y"))
    PointSources.writeText(pts, out)
    PointSources.points(s, out, d = 2, strict = true)
      .select($"v"(0).as("x"), $"v"(1).as("y"))
  }
  private val p01Sql =
    s"""SELECT (r.range * 37 % 1000) / 1000.0 AS x,
       |  (r.range * 11 % 1000) / 1000.0 AS y
       |FROM range($nPts) r""".stripMargin

  // ---- p02: K2 text matrix writer → S4 whole-file matrix scan ----
  private val mRows = 64
  private val mCols = 16

  private def p02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val f = java.nio.file.Files.createTempFile("graft-matrix", ".txt")
    f.toFile.deleteOnExit()
    graft.mm.MatrixIO.writePointsText(f.toString,
      Array.tabulate(mRows * mCols)(k =>
        ((k / mCols) * 37 + (k % mCols) * 11) % 1000 / 1000.0), mCols)
    PointSources.wholeFileMatrix(s, f.toString, mRows, mCols)
      .flatMap { b =>
        for (i <- 0 until b.blockRows; j <- 0 until b.matrixCols)
          yield ((b.start + i).toLong, j.toLong, b.data(i * b.matrixCols + j))
      }
      .toDF("row", "col", "v")
  }
  private val p02Sql =
    s"""SELECT r.range AS row, c.range AS col,
       |  CAST((r.range * 37 + c.range * 11) % 1000 AS DOUBLE) / 1000.0 AS v
       |FROM range($mRows) r CROSS JOIN range($mCols) c""".stripMargin

  val all: Seq[Q] = Seq(
    Q("p01_points_text_roundtrip", p01, Some(p01Sql)),
    Q("p02_wholefile_matrix_roundtrip", p02, Some(p02Sql)))
}
