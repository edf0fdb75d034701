package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The compactor sketch's theorem gate (the FrequentItemsSpec
  * discipline): the self-certified error budget must hold against
  * exact ranks for every query, under every partition layout and merge
  * shape tried — and the budget must be honest work, not slack (the
  * compacting regime is exercised, budgets stay well under n).
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def exactRank(sorted: Array[Long], v: Long): (Long, Long) = {
    // true rank range of value v in the sorted data: [lo, hi] where lo
    // = #items < v + 1 and hi = #items <= v
    val lo = sorted.indexWhere(_ >= v) match { case -1 => sorted.length case i => i }
    val hi = sorted.lastIndexWhere(_ <= v) + 1
    (lo + 1L, hi.toLong)
  }

  test("exact degeneration: k >= n gives zero budget and exact ranks") {
    val data = new scala.util.Random(11).shuffle(
      (1L to 1000L).toVector).toArray
    val sk = QuantileSketch.fromPartition(data.iterator, k = 2048)
    assert(sk.errBound == 0L)
    assert(sk.n == 1000L)
    for (r <- Seq(1L, 7L, 500L, 999L, 1000L))
      assert(QuantileSketch.valueAtRank(sk, r) == r, s"rank $r")
  }

  test("certified budget holds vs exact ranks in the compacting regime, any layout") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(60000)(rnd.nextLong(1000000L))
    val sorted = data.sorted
    for (parts <- Seq(1, 3, 8, 32)) {
      val slices = data.grouped(math.max(1, data.length / parts)).toSeq
      val sk = slices
        .map(sl => QuantileSketch.fromPartition(sl.iterator, k = 256))
        .reduce(QuantileSketch.merge)
      assert(sk.n == data.length.toLong)
      assert(sk.errBound > 0L, "compacting regime not reached — raise n")
      assert(sk.errBound < data.length / 4L,
        s"budget ${sk.errBound} uselessly slack vs n=${data.length}")
      assert(sk.retained <= 256 * sk.levels.size,
        "level capacity violated")
      for (p <- Seq(1, 10, 25, 50, 75, 90, 99)) {
        val target = math.max(1L, (p.toLong * sk.n + 99L) / 100L)
        val v = QuantileSketch.valueAtRank(sk, target)
        val (lo, hi) = exactRank(sorted, v)
        // v's true rank interval must come within errBound of target
        val dist =
          if (target < lo) lo - target
          else if (target > hi) target - hi
          else 0L
        assert(dist <= sk.errBound,
          s"parts=$parts p=$p: answer $v true-rank [$lo,$hi] misses " +
            s"target $target by $dist > budget ${sk.errBound}")
      }
    }
  }

  test("budgets add across merge shapes; every shape honors its own bound") {
    val rnd = new scala.util.Random(23)
    val chunks = Vector.fill(8)(Array.fill(4000)(rnd.nextLong(100000L)))
    val all = chunks.flatten.toArray.sorted
    val sks = chunks.map(c => QuantileSketch.fromPartition(c.iterator, 128))
    val linear = sks.reduceLeft(QuantileSketch.merge)
    val tree = {
      def pair(v: Vector[QuantileSketch.Sketch]): Vector[QuantileSketch.Sketch] =
        v.grouped(2).map(g => g.reduce(QuantileSketch.merge)).toVector
      var cur = sks
      while (cur.size > 1) cur = pair(cur)
      cur.head
    }
    for (sk <- Seq(linear, tree)) {
      assert(sk.n == all.length.toLong)
      for (p <- Seq(5, 50, 95)) {
        val target = math.max(1L, (p.toLong * sk.n + 99L) / 100L)
        val v = QuantileSketch.valueAtRank(sk, target)
        val (lo, hi) = exactRank(all, v)
        val dist =
          if (target < lo) lo - target
          else if (target > hi) target - hi else 0L
        assert(dist <= sk.errBound, s"p=$p dist $dist > ${sk.errBound}")
      }
    }
  }

  test("d64 over sf0.1 (compacting regime) stays within its own budget vs exact") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val vals = graft.Tables(spark, dir, "documents")
      .filter($"n_chars".isNotNull)
      .select($"n_chars".cast("long")).as[Long]
    val exact = vals.collect().sorted
    val sk = QuantileSketch.sketch(vals, k = 256) // force compaction
    assert(sk.errBound > 0L, "sf0.1 with k=256 must compact")
    for (p <- Seq(1, 25, 50, 75, 99)) {
      val target = math.max(1L, (p.toLong * sk.n + 99L) / 100L)
      val v = QuantileSketch.valueAtRank(sk, target)
      val (lo, hi) = exactRank(exact, v)
      val dist =
        if (target < lo) lo - target
        else if (target > hi) target - hi else 0L
      assert(dist <= sk.errBound,
        s"p=$p: $v misses target $target by $dist > ${sk.errBound}")
    }
  }

  test("mass conservation: weighted expansion always sums to n") {
    val rnd = new scala.util.Random(5)
    // odd sizes exercise the odd-tail no-mass-loss branch
    for (n <- Seq(1, 2, 129, 1000, 4097)) {
      val sk = QuantileSketch.fromPartition(
        Iterator.fill(n)(rnd.nextLong(999L)), k = 64)
      val mass = sk.levels.zipWithIndex
        .map { case (lv, i) => lv.size.toLong * (1L << i) }.sum
      assert(mass == n.toLong, s"n=$n mass=$mass")
      assert(sk.n == n.toLong)
    }
  }
}
