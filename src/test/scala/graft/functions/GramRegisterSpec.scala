package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The register-buffer Gram aggregate's exactness contract:
  *
  *  - the manual scale-15 snap equals Spark's double→DECIMAL(30,15)
  *    cast route (Double.toString → HALF_UP) over random doubles —
  *    this is the bit that lets the long fast lane replace BigDecimal;
  *  - `gramSums` (one GramRegisterAgg buffer) is cell-identical to the
  *    pre-r14 explode+groupBy decimal-sum form it replaced, on the
  *    real embedding fixture — the independent oracle for the rewrite;
  *  - the aggregate is exactly partition-invariant (merge is integer
  *    addition), the premise for the v32/v33/s41 pinned goldens.
  */
class GramRegisterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("snapUnscaled15 equals the BigDecimal cast reference on random doubles") {
    def ref(d: Double): Long =
      new JBigDecimal(java.lang.Double.toString(d))
        .setScale(15, RoundingMode.HALF_UP).unscaledValue().longValueExact()
    val rnd = new scala.util.Random(42)
    // uniform over the fast range, plus magnitude-stratified samples
    // (uniform undersamples tiny values, where scientific notation and
    // underflow-to-zero kick in)
    for (_ <- 0 until 50000) {
      val d = (rnd.nextDouble() - 0.5) * 2 * DecimalSnap.FastAbsMax
      assert(DecimalSnap.snapUnscaled15(d) == ref(d), s"snap mismatch at $d")
    }
    for (ex <- -320 to 2; _ <- 0 until 50) {
      val d = (rnd.nextDouble() - 0.5) * 2 * math.pow(10, ex)
      assert(DecimalSnap.snapUnscaled15(d) == ref(d), s"snap mismatch at $d")
    }
    for (d <- Seq(0.0, -0.0, 1.0, -1.0, 0.1, -0.1, 1e-15, -1e-15, 5e-16,
        4.9e-324, -4.9e-324, 1e-300, 2.5e-16, -2.5e-16, 999.999, -999.999,
        1.0 / 3.0, math.Pi, 1e3, -1e3, 6.103515625e-5, 1.23456789012345e-7))
      assert(DecimalSnap.snapUnscaled15(d) == ref(d), s"snap mismatch at $d")
  }

  test("snapFast15 answers only where it matches the toString reference (r21)") {
    def ref(d: Double): Long =
      new JBigDecimal(java.lang.Double.toString(d))
        .setScale(15, RoundingMode.HALF_UP).unscaledValue().longValueExact()
    val rnd = new scala.util.Random(1021)
    var answered = 0
    var total = 0
    // adversarial: doubles DENSE around scale-15 half-up boundaries
    // (k + 0.5) · 10^-15, where fast-path overreach would flip the
    // rounding — walk ulp-adjacent neighbors on both sides
    for (_ <- 0 until 20000) {
      val k = rnd.nextInt(1000000000).toLong
      val base = (k + 0.5) * 1e-15 * (if (rnd.nextBoolean()) 1 else -1)
      var d = base
      for (_ <- 0 until 8) {
        d = Math.nextUp(d)
        val f = DecimalSnap.snapFast15(d); total += 1
        if (f != DecimalSnap.AmbiguousSnap) { answered += 1; assert(f == ref(d), s"fast snap wrong at $d") }
      }
      d = base
      for (_ <- 0 until 8) {
        d = Math.nextDown(d)
        val f = DecimalSnap.snapFast15(d); total += 1
        if (f != DecimalSnap.AmbiguousSnap) { answered += 1; assert(f == ref(d), s"fast snap wrong at $d") }
      }
    }
    // magnitude sweep incl. the self-limiting large range
    for (ex <- -320 to 2; _ <- 0 until 100) {
      val d = (rnd.nextDouble() - 0.5) * 2 * math.pow(10, ex)
      val f = DecimalSnap.snapFast15(d); total += 1
      if (f != DecimalSnap.AmbiguousSnap) { answered += 1; assert(f == ref(d), s"fast snap wrong at $d") }
    }
    // typical Gram-product range must mostly take the fast path, or the
    // r21 fold win silently evaporates
    var fastHits = 0
    for (_ <- 0 until 10000) {
      val a = rnd.nextGaussian() * 0.125
      val b = rnd.nextGaussian() * 0.125
      val d = a * b
      val f = DecimalSnap.snapFast15(d); total += 1
      if (f != DecimalSnap.AmbiguousSnap) {
        fastHits += 1; answered += 1
        assert(f == ref(d), s"fast snap wrong at $d")
      }
    }
    assert(fastHits > 9000, s"fast path answers only $fastHits/10000 in the Gram range")
    assert(answered > 0 && total > answered, // both paths exercised
      s"degenerate coverage: $answered/$total")
  }

  test("gramSums equals the pre-r14 explode+groupBy decimal-sum form on the fixture") {
    import spark.implicits._
    val e = spark.read.parquet(s"${TestSpark.sf001}/embeddings.parquet")
      .select($"vec_id", graft.vec.VectorOps.toDouble($"embedding").as("v"))
    val d = 64
    val oldForm = e.filter(size(col("v")) === d)
      .select(explode(expr(
        s"flatten(transform(sequence(0, ${d - 1}), i -> " +
          s"transform(sequence(i, ${d - 1}), j -> struct(" +
          "i as i, j as j, " +
          "cast(v[i] * v[j] as decimal(30,15)) as p, " +
          "case when j = i then cast(v[i] as decimal(30,15)) " +
          "else cast(0 as decimal(30,15)) end as x))))")).as("t"))
      .groupBy($"t.i", $"t.j")
      .agg(sum($"t.p").as("sp"), sum($"t.x").as("sx"),
        count(lit(1)).as("cnt"))
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), (BigDecimal, BigDecimal, Long)] =
      df.collect().map(r => ((r.getInt(0), r.getInt(1)),
        (BigDecimal(r.getDecimal(2)), BigDecimal(r.getDecimal(3)), r.getLong(4)))).toMap
    val want = cells(oldForm)
    val got = cells(graft.operators.VectorQueries.gramSums(e))
    assert(got.size == d * (d + 1) / 2 && want.size == got.size)
    val bad = want.keys.filter(k => want(k) != got(k))
    assert(bad.isEmpty,
      s"register cells diverge from the explode form at ${bad.take(3).map(k => (k, want(k), got(k)))}")
  }

  test("gramSums is exactly partition-invariant") {
    import spark.implicits._
    val e = spark.read.parquet(s"${TestSpark.sf001}/embeddings.parquet")
      .select($"vec_id", graft.vec.VectorOps.toDouble($"embedding").as("v"))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(graft.operators.VectorQueries.gramSums(e.repartition(1))) ==
      canon(graft.operators.VectorQueries.gramSums(e.repartition(17))))
  }

  test("buffer long-lane spill and merge stay exact under adversarial magnitudes") {
    // values straddling the fast/slow boundary and forcing spills:
    // update two buffers with disjoint halves, merge, compare against
    // one buffer fed everything — must be identical registers
    val dim = 3
    val rnd = new scala.util.Random(7)
    val rows = Array.fill(4096)(Array.fill(dim)(
      (rnd.nextDouble() - 0.5) * (if (rnd.nextInt(10) == 0) 2e4 else 2e3)))
    val one = new GramRegisterBuffer(dim)
    val a = new GramRegisterBuffer(dim)
    val b = new GramRegisterBuffer(dim)
    rows.foreach(one.update)
    rows.take(2048).foreach(a.update)
    rows.drop(2048).foreach(b.update)
    a.merge(b)
    assert(a.cnt == one.cnt)
    for (r <- 0 until dim * (dim + 1) / 2 + dim)
      assert(a.total(r) == one.total(r), s"register $r diverged after merge")
    // and the registers equal a plain BigDecimal reference
    def ref(d: Double): JBigDecimal =
      if (java.lang.Double.isNaN(d) || d >= 1e15 || d <= -1e15)
        new JBigDecimal(0)
      else new JBigDecimal(java.lang.Double.toString(d))
        .setScale(15, RoundingMode.HALF_UP)
    for (i <- 0 until dim; j <- i until dim) {
      val want = rows.foldLeft(JBigDecimal.ZERO)((acc, v) =>
        acc.add(ref(v(i) * v(j))))
      val got = new JBigDecimal(one.total(one.pairIndex(i, j)), 15)
      assert(got.compareTo(want) == 0, s"pair ($i,$j): $got vs $want")
    }
  }
}
