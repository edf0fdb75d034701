package graft.mm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GemmSpec extends AnyFunSuite {

  /** Naive reference multiply with B row-major (independent of the
    * kernel's col-major layout and loop order). */
  private def naive(a: Array[Double], aRows: Int, aCols: Int,
      bRowMajor: Array[Double], bCols: Int): Array[Double] = {
    val c = new Array[Double](aRows * bCols)
    for (i <- 0 until aRows; j <- 0 until bCols) {
      var s = 0.0
      for (k <- 0 until aCols) s += a(i * aCols + k) * bRowMajor(k * bCols + j)
      c(i * bCols + j) = s
    }
    c
  }

  test("kernel is BIT-identical to the ascending-k triple loop on tail-exercising shapes") {
    // the r20 register-blocked kernel's contract: blocking reorders
    // only which (i,j) cells advance together — every cell is still
    // its own strict ascending-k FP chain, so equality here is EXACT
    // (==), not tolerance. Shapes 1..20 exercise the 4×4 main block,
    // both tails, and the all-tail (<4) cases.
    val rnd = new scala.util.Random(1)
    for (_ <- 1 to 20) {
      val (m, k, n) = (1 + rnd.nextInt(20), 1 + rnd.nextInt(20), 1 + rnd.nextInt(20))
      val a = Array.fill(m * k)(rnd.nextDouble() - 0.5)
      val b = Array.fill(k * n)(rnd.nextDouble() - 0.5)
      val got = Gemm.gemm(a, m, k, Gemm.toColMajor(b, k, n), n)
      val want = naive(a, m, k, b, n)
      assert(got.toSeq == want.toSeq,
        s"blocked kernel diverged from the ascending-k reference at ${m}x${k}x$n")
    }
  }

  test("identity B returns A") {
    val a = Array.tabulate(12)(_.toDouble)
    val id = Array.tabulate(16)(i => if (i % 5 == 0) 1.0 else 0.0) // 4x4 I
    val got = Gemm.gemm(a, 3, 4, Gemm.toColMajor(id, 4, 4), 4)
    assert(got.toSeq == a.toSeq)
  }

  test("toColMajor round-trips") {
    val m = Array.tabulate(6)(_.toDouble) // 2x3
    val cm = Gemm.toColMajor(m, 2, 3)
    assert(cm.toSeq == Seq(0.0, 3.0, 1.0, 4.0, 2.0, 5.0))
  }

  test("assemble rejects gaps and overlaps") {
    def blk(idx: Int, start: Int, rows: Int) =
      DoubleMatrixBlock(idx, start, rows, 4, 2, new Array[Double](rows * 2))
    assert(Gemm.assemble(Seq(blk(0, 0, 2), blk(1, 2, 2))).length == 8)
    intercept[IllegalArgumentException] {
      Gemm.assemble(Seq(blk(0, 0, 2), blk(1, 3, 1)))
    }
    intercept[IllegalArgumentException] {
      Gemm.assemble(Seq(blk(0, 0, 2), blk(1, 2, 1)))
    }
  }

  test("end-to-end: binary A scan -> distributed multiply -> assemble == serial (reference self-check)") {
    val spark = TestSpark.spark
    val (rows, cols, bCols) = (97, 13, 5)
    val a = MatrixIO.randomMatrix(rows, cols, seed = 42)
    val b = MatrixIO.randomMatrix(cols, bCols, seed = 43)
    val bCol = Gemm.toColMajor(b, cols, bCols)
    val dir = java.nio.file.Files.createTempDirectory("gemm").toString
    val path = s"$dir/a.bin"
    MatrixIO.writeDoubleMatrix(path, a, bigEndian = true)

    val blocks = MatrixIO.doubleMatrixBlocks(spark, path, rows, cols,
      numSplits = 7, bigEndian = true)
    val c = Gemm.multiply(spark, blocks, bCol, bCols)
    val got = Gemm.assemble(c.collect().toSeq)
    val want = Gemm.serialMultiply(a, rows, cols, bCol, bCols)
    assert(got.toSeq == want.toSeq) // bit-identical: same kernel, same order
  }
}
