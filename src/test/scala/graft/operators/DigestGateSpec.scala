package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins DigestGate's fold semantics (VERDICT r19 wrong 1): the r18
  * form's two XOR folds were both functions of the same row string, so
  * replacing two copies of row X with two copies of row Y preserved
  * n_rows, xor_a AND xor_b — an undetectable full-output drift class.
  * The second fold is now a wrapping 64-bit SUM, which is
  * multiset-linear and therefore shifts on exactly that swap. This
  * spec proves (1) the blind spot is closed, (2) the folds stay
  * order/partition-invariant (the golden-pinning premise), and (3) the
  * decimal wrap is value-identical to BigInt arithmetic mod 2^64. */
class DigestGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(rows: Seq[(Long, String)], parts: Int): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).repartition(parts)
      .toDF("id", "payload")
  }

  private def dig(d: DataFrame): (Long, Long, Long) = {
    val r = DigestGate.digest(d).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("even-multiplicity swap: 2×X → 2×Y is caught by sum_b where every xor fold is blind") {
    val xx = df(Seq((1L, "x"), (1L, "x")), 2)
    val yy = df(Seq((2L, "y"), (2L, "y")), 2)
    val (nx, xorX, sumX) = dig(xx)
    val (ny, xorY, sumY) = dig(yy)
    assert(nx == ny)
    // the old gate's view: XOR of a duplicated row self-cancels, so
    // BOTH frames read identically on every xor fold
    assert(xorX == 0L && xorY == 0L,
      "xor fold of a duplicated row must self-cancel — this is the blind spot")
    assert(sumX != sumY,
      "sum_b must distinguish 2×X from 2×Y: the even-multiplicity blind spot is back")
  }

  test("digest is order- and partition-invariant, and multiplicity-sensitive") {
    val rows = (1L to 100L).map(i => (i, s"row$i"))
    val a = dig(df(rows, 1))
    val b = dig(df(rows.reverse, 7))
    assert(a == b, "digest must not depend on row order or partitioning")
    val dup = dig(df(rows ++ rows.take(1), 3))
    assert(dup != a, "adding a duplicate row must change the digest")
  }

  test("wrapping sum matches BigInt arithmetic mod 2^64 on values that overflow a long") {
    val rows = (1L to 4096L).map(i => (i, "z" * 64))
    val d = df(rows, 8)
    val hb = d.select(col("id"), col("payload"))
    // recompute h_b exactly as DigestGate does (same canonical string)
    val parts = Seq(col("id").cast("string"), col("payload"))
      .map(c => coalesce(c, lit("null")))
    val rowStr = concat_ws("", parts: _*)
    val hbs = hb.select(xxhash64(rowStr, lit(1)).as("h")).collect().map(_.getLong(0))
    val m = BigInt(1) << 64
    val wrapped = {
      val s = hbs.map(BigInt(_)).sum.mod(m)
      if (s >= (BigInt(1) << 63)) (s - m).toLong else s.toLong
    }
    val (_, _, sumB) = dig(d)
    assert(sumB == wrapped,
      s"decimal-wrap sum_b $sumB != BigInt-mod reference $wrapped")
  }
}
