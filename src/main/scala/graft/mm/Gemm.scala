package graft.mm

import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed dense GEMM — the reference's minimum end-to-end slice
  * (SURVEY §3.3 / §7.2): row-partitioned A × broadcast B → row blocks
  * of C → index-ordered assemble, with the reference's serial-multiply
  * self-check as the test oracle (mm/MatrixMultiply.java:107-160,
  * kernel mm/Utils.java:16-35).
  */
object Gemm {

  /** Block GEMM kernel (N1): C[aRows×bCols] = A(row-major) × B(col-major).
    * B column-major so the inner k-loop walks two contiguous runs
    * (reference layout choice, mm/Utils.java:29). Plain triple loop in
    * deterministic k order — bit-reproducible across runs and engines.
    */
  def gemm(a: Array[Double], aRows: Int, aCols: Int,
      bColMajor: Array[Double], bCols: Int): Array[Double] = {
    require(bColMajor.length == aCols * bCols,
      s"B ${bColMajor.length} != $aCols x $bCols")
    val c = new Array[Double](aRows * bCols)
    var i = 0
    while (i < aRows) {
      val aOff = i * aCols
      var j = 0
      while (j < bCols) {
        val bOff = j * aCols
        var s = 0.0
        var k = 0
        while (k < aCols) {
          s += a(aOff + k) * bColMajor(bOff + k)
          k += 1
        }
        c(i * bCols + j) = s
        j += 1
      }
      i += 1
    }
    c
  }

  /** Row-major → column-major transpose for the broadcast operand. */
  def toColMajor(rowMajor: Array[Double], rows: Int, cols: Int): Array[Double] = {
    val out = new Array[Double](rowMajor.length)
    var i = 0
    while (i < rows) {
      var j = 0
      while (j < cols) {
        out(j * rows + i) = rowMajor(i * cols + j)
        j += 1
      }
      i += 1
    }
    out
  }

  /** Distributed multiply: every A block × broadcast B (J3+N1). The
    * broadcast ships B once per executor; each task runs the kernel on
    * its block — no shuffle at all until/unless the caller gathers.
    */
  def multiply(spark: SparkSession, blocks: Dataset[DoubleMatrixBlock],
      bColMajor: Array[Double], bCols: Int): Dataset[DoubleMatrixBlock] = {
    import spark.implicits._
    val bBc = spark.sparkContext.broadcast(bColMajor)
    blocks.map { bl =>
      val c = gemm(bl.data, bl.blockRows, bl.matrixCols, bBc.value, bCols)
      DoubleMatrixBlock(bl.index, bl.start, bl.blockRows,
        bl.matrixRows, bCols, c)
    }
  }

  /** Ordered gather (A4): collect the (small) C blocks to the driver and
    * assemble by global start row, hard-failing on gaps/overlap exactly
    * like the reference (damds/CG.java:313-323). Matrices gathered this
    * way are O(rows×bCols) driver-side — callers keep bCols small (the
    * broadcast operand's width), which is the same contract the
    * reference's parallelism-1 reduceGroup had.
    */
  def assemble(blocks: Seq[DoubleMatrixBlock]): Array[Double] = {
    require(blocks.nonEmpty, "no blocks to assemble")
    val rows = blocks.head.matrixRows
    val cols = blocks.head.matrixCols
    val out = new Array[Double](rows * cols)
    val sorted = blocks.sortBy(_.start)
    var expect = 0
    sorted.foreach { bl =>
      require(bl.start == expect,
        s"gather gap: expected row $expect, got block at ${bl.start}")
      System.arraycopy(bl.data, 0, out, bl.start * cols, bl.data.length)
      expect = bl.start + bl.blockRows
    }
    require(expect == rows, s"gather incomplete: $expect of $rows rows")
    out
  }

  /** Serial driver-side multiply — the reference's "testing mode" golden
    * oracle (mm/MatrixMultiply.java:175-181). A row-major, B col-major.
    */
  def serialMultiply(a: Array[Double], aRows: Int, aCols: Int,
      bColMajor: Array[Double], bCols: Int): Array[Double] =
    gemm(a, aRows, aCols, bColMajor, bCols)

  /** Text sink (K1): one "r c value" line per cell, written distributed
    * (blocks explode to lines; no single-task squeeze).
    */
  def writeAsText(spark: SparkSession, blocks: Dataset[DoubleMatrixBlock],
      path: String): Unit = {
    import spark.implicits._
    blocks.flatMap { bl =>
      for {
        i <- 0 until bl.blockRows
        j <- 0 until bl.matrixCols
      } yield s"${bl.start + i} $j ${bl.data(i * bl.matrixCols + j)}"
    }.write.mode("overwrite").text(path)
  }
}
