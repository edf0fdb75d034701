package graft.operators

import graft.Tables
import graft.mm.Gemm
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dense block-GEMM exposed as a registered query (reference N1 + J3:
  * mm/MatrixMultiply.java:110-158, kernel mm/Utils.java:16-35): the
  * embeddings table is the row-partitioned A (n×64), B is a 64×8
  * formula-defined constant (so DuckDB can rebuild it), the kernel runs
  * per-partition against the broadcast col-major B, and the result is
  * the relational (row_id, col_id, value) view.
  *
  * The kernel's inner k-loop is a deterministic index-order sum, so
  * values are bit-identical to DuckDB's list_reduce fold — this is the
  * real mapPartitions GEMM path under an oracle, not a relational toy.
  */
object MatrixQueries {

  private val dim = 64
  private val bCols = 8

  /** B[k][j] = (((k·bCols + j) mod 17) − 8) / 17, row-major. */
  private def bMatrix: Array[Double] =
    Array.tabulate(dim * bCols)(i => ((i % 17) - 8) / 17.0)

  private def n01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bCol = Gemm.toColMajor(bMatrix, dim, bCols)
    val bBc = s.sparkContext.broadcast(bCol)
    val e = Tables(s, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .as[(Long, Seq[Double])]
    e.mapPartitions { it =>
      val rows = it.toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val n = rows.length
        val a = new Array[Double](n * dim)
        var i = 0
        while (i < n) {
          val v = rows(i)._2
          var k = 0
          while (k < dim) { a(i * dim + k) = v(k); k += 1 }
          i += 1
        }
        val c = Gemm.gemm(a, n, dim, bBc.value, bCols)
        rows.iterator.zipWithIndex.flatMap { case ((id, _), r) =>
          (0 until bCols).iterator.map(j =>
            (id, j.toLong, c(r * bCols + j)))
        }
      }
    }.toDF("row_id", "col_id", "value")
      .select($"row_id", $"col_id", round($"value", 6).as("value"))
  }

  private val n01Sql =
    s"""WITH js AS (SELECT j FROM generate_series(0, ${bCols - 1}) AS t(j)),
       |     d AS (SELECT e.vec_id AS row_id, CAST(js.j AS BIGINT) AS col_id,
       |             list_reduce(list_transform(generate_series(1, $dim),
       |               k -> CAST(e.embedding[k] AS DOUBLE) *
       |                    (CAST((((k - 1) * $bCols + js.j) % 17) - 8 AS DOUBLE) / 17.0)),
       |               (s, v) -> s + v) AS value
       |           FROM embeddings e CROSS JOIN js)
       |SELECT row_id, col_id, round(value, 6) AS value FROM d""".stripMargin

  // ---- n06/n07: binary matrix file roundtrip through the DSv2 source
  // (G1 generate → K2 file sink → S2/S3 scan, + N7 decode for shorts) ----
  // A formula-defined matrix is written as a headerless binary file and
  // read back through format("graft-matrix") — the reference's external-
  // shape file contract — so the writer, the row-aligned split scan and
  // the fixed-point decode are all under the DuckDB oracle (which just
  // recomputes the formula; doubles survive the binary roundtrip
  // bit-exactly, shorts decode as s/32767).
  private val mRows = 64
  private val mCols = 16

  private def roundtrip(s: SparkSession, valueType: String,
      write: String => Unit): DataFrame = {
    import s.implicits._
    val f = java.nio.file.Files.createTempFile("graft-roundtrip", ".bin")
    write(f.toString)
    f.toFile.deleteOnExit()
    s.read.format("graft-matrix")
      .option("path", f.toString).option("rows", mRows).option("cols", mCols)
      .option("valueType", valueType).option("splits", 8).load()
      .select($"row", posexplode($"values").as(Seq("col", "v")))
      .select($"row", $"col".cast("long").as("col"), $"v")
  }

  private def n06(s: SparkSession, dir: String): DataFrame =
    roundtrip(s, "double", p => graft.mm.MatrixIO.writeDoubleMatrix(p,
      Array.tabulate(mRows * mCols)(k =>
        ((k / mCols) * 37 + (k % mCols) * 11) % 1000 / 1000.0)))
  private val n06Sql =
    s"""SELECT r.range AS row, c.range AS col,
       |  CAST((r.range * 37 + c.range * 11) % 1000 AS DOUBLE) / 1000.0 AS v
       |FROM range($mRows) r CROSS JOIN range($mCols) c""".stripMargin

  private def n07(s: SparkSession, dir: String): DataFrame =
    roundtrip(s, "short", p => graft.mm.MatrixIO.writeShortMatrix(p,
      Array.tabulate(mRows * mCols)(k =>
        (((k / mCols) * 37 + (k % mCols) * 11) % 32768).toShort)))
  private val n07Sql =
    s"""SELECT r.range AS row, c.range AS col,
       |  ((r.range * 37 + c.range * 11) % 32768) * (1.0 / 32767) AS v
       |FROM range($mRows) r CROSS JOIN range($mCols) c""".stripMargin

  val all: Seq[Q] = Seq(
    Q("n01_block_gemm", n01, Some(n01Sql)),
    Q("n06_matrix_roundtrip", n06, Some(n06Sql)),
    Q("n07_matrix_roundtrip_short", n07, Some(n07Sql)))
}
