package graft.damds

import java.nio.file.Files

import graft.TestSpark
import graft.mm.MatrixIO
import org.scalatest.funsuite.AnyFunSuite

class DamdsIOSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeFixture(n: Int): (String, String) = {
    val dir = Files.createTempDirectory("graft-damds-io").toString
    val rnd = new scala.util.Random(5)
    val dist = Array.fill[Short]((n * n).toInt)((rnd.nextInt(30000)).toShort)
    val weight = Array.fill[Short]((n * n).toInt)((rnd.nextInt(3)).toShort)
    MatrixIO.writeShortMatrix(s"$dir/dist.bin", dist)
    MatrixIO.writeShortMatrix(s"$dir/weight.bin", weight)
    (s"$dir/dist.bin", s"$dir/weight.bin")
  }

  test("J1 join load and J2 side-read load produce identical blocks") {
    val n = 20
    val (distF, weightF) = writeFixture(n)
    val j1 = DamdsIO.loadJoin(spark, distF, weightF, n, numSplits = 4)
      .collect().sortBy(_.index)
    val j2 = DamdsIO.loadSideRead(spark, distF, Some(weightF), n,
      numSplits = 4).collect().sortBy(_.index)
    assert(j1.length == 4 && j2.length == 4)
    j1.zip(j2).foreach { case (a, b) =>
      assert(a.index == b.index && a.start == b.start &&
        a.blockRows == b.blockRows && a.n == b.n)
      assert(a.dist.toSeq == b.dist.toSeq)
      assert(a.weight.toSeq == b.weight.toSeq)
    }
  }

  test("J2 with no weight file gives constant weight 1.0") {
    val n = 12
    val (distF, _) = writeFixture(n)
    val blocks = DamdsIO.loadSideRead(spark, distF, None, n, numSplits = 3)
      .collect()
    assert(blocks.forall(_.weight.isEmpty))
    assert(blocks.forall(b => b.w(0, 0) == 1.0))
  }

  test("blocks cover all rows exactly once (S1 split math)") {
    val n = 17
    val (distF, weightF) = writeFixture(n)
    val blocks = DamdsIO.loadJoin(spark, distF, weightF, n, numSplits = 5)
      .collect().sortBy(_.start)
    val covered = blocks.flatMap(b => b.start until (b.start + b.blockRows))
    assert(covered.toSeq == (0 until n))
  }
}
