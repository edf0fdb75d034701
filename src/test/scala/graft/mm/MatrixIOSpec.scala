package graft.mm

import org.scalatest.funsuite.AnyFunSuite

class MatrixIOSpec extends AnyFunSuite {

  test("rowSplits covers all rows with q/r remainder distribution") {
    for (rows <- Seq(0, 1, 7, 32, 100, 101); splits <- Seq(1, 3, 7, 32)) {
      val s = MatrixIO.rowSplits(rows, splits)
      assert(s.map(_._2).sum == rows, s"rows=$rows splits=$splits")
      // contiguous, no gaps
      s.foldLeft(0) { case (expect, (start, n)) =>
        assert(start == expect); assert(n > 0); start + n
      }
      // balanced: heights differ by at most 1
      if (s.nonEmpty) assert(s.map(_._2).max - s.map(_._2).min <= 1)
    }
  }

  test("double matrix binary round-trip, both endians") {
    val data = MatrixIO.randomMatrix(11, 3, seed = 5)
    for (be <- Seq(true, false)) {
      val p = java.nio.file.Files.createTempFile("m", ".bin").toString
      MatrixIO.writeDoubleMatrix(p, data, be)
      val back = MatrixIO.readDoubleSlice(p, 3, 0, 11, be)
      assert(back.toSeq == data.toSeq)
      // slice read: rows 4..7
      val slice = MatrixIO.readDoubleSlice(p, 3, 4, 3, be)
      assert(slice.toSeq == data.slice(12, 21).toSeq)
    }
  }

  test("short matrix binary round-trip + fixed-point codec") {
    val shorts = Array.tabulate(24)(i => ((i * 1000) % 32767).toShort)
    val p = java.nio.file.Files.createTempFile("s", ".bin").toString
    MatrixIO.writeShortMatrix(p, shorts, bigEndian = true)
    val back = MatrixIO.readShortSlice(p, 6, 1, 2, bigEndian = true)
    assert(back.toSeq == shorts.slice(6, 18).toSeq)
    // N7 decode/encode round-trip within quantization error
    assert(math.abs(FixedPoint.decode(FixedPoint.encode(0.5)) - 0.5) < 1e-4)
    assert(FixedPoint.decode(Short.MaxValue) == 1.0)
  }

  test("distributed short block scan decodes the right slices") {
    val spark = graft.TestSpark.spark
    val shorts = Array.tabulate(40)(i => (i * 7).toShort) // 10x4
    val p = java.nio.file.Files.createTempFile("sm", ".bin").toString
    MatrixIO.writeShortMatrix(p, shorts, bigEndian = false)
    val blocks = MatrixIO.shortMatrixBlocks(spark, p, 10, 4,
      numSplits = 3, bigEndian = false).collect().sortBy(_.start)
    assert(blocks.map(_.blockRows).sum == 10)
    val all = blocks.flatMap(_.data)
    assert(all.toSeq == shorts.toSeq)
  }
}
