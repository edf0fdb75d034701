package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewAndStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 10k rows where 90% share one hot key. */
  private def skewed() = {
    import spark.implicits._
    spark.range(10000).select(
      when($"id" % 10 < 9, lit(1L)).otherwise($"id" % 100).as("k"),
      ($"id" % 7).cast("double").as("v"))
  }

  test("saltedJoin equals the plain join on a skewed key") {
    import spark.implicits._
    val dim = (0L until 100L).map(i => (i, s"name_$i")).toDF("k", "name")
    val plain = skewed().join(dim, "k")
      .groupBy($"name").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed(), dim, "k", salts = 8)
      .groupBy($"name").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(plain == salted)
  }

  test("saltedSumCount equals plain groupBy sum/count") {
    import spark.implicits._
    val plain = skewed().groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(skewed(), "k", "v", salts = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(plain == salted)
  }

  test("q34 salted join query equals its unsalted form") {
    import spark.implicits._
    def fact = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select(
        when($"l_partkey" % 2 === 0, 0L).otherwise($"l_partkey" % 32).as("k"),
        $"l_quantity".cast("decimal(18,2)").as("qty"))
    def dim = spark.read.parquet(s"${TestSpark.sf0001}/supplier.parquet")
      .groupBy(($"s_suppkey" % 32).as("k"))
      .agg(sum($"s_acctbal".cast("decimal(18,2)")).as("bal"))
    val plain = fact.join(dim, "k").groupBy($"k")
      .agg(sum($"qty").cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"), max($"bal").cast("double").as("bal"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3))).toSet
    val salted = Catalog.queries("q34_salted_join")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(plain == salted)
  }

  test("q31 sketch aggregations stay within error bounds of the exact answers") {
    import spark.implicits._
    val approx = Catalog.queries("q31_approx_stats")(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"),
        expr("percentile(l_extendedprice, array(0.5, 0.99))").as("p"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Double](2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (nApprox, p50, p99)) <- approx) {
      val (nExact, ps) = exact(k)
      assert(math.abs(nApprox - nExact).toDouble / nExact <= 0.05,
        s"$k distinct: $nApprox vs $nExact")
      // GK sketch with accuracy 10000 on a few thousand rows per group
      // is near-exact; allow 2% relative drift
      assert(math.abs(p50 - ps(0)) / ps(0) <= 0.02, s"$k p50: $p50 vs ${ps(0)}")
      assert(math.abs(p99 - ps(1)) / ps(1) <= 0.02, s"$k p99: $p99 vs ${ps(1)}")
    }
  }

  test("typed DoubleStatistics Aggregator matches the expression agg (A6)") {
    import spark.implicits._
    val vals = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select($"l_discount".cast("double").as("d"))
    val t = vals.as[Double].select(StatsAggregator.toColumn).head()
    val e = vals.agg(
      count($"d").as("cnt"), min($"d").as("vmin"),
      max($"d").as("vmax"),
      min(when($"d" > 0.0, $"d")).as("pmin"),
      sum($"d").as("vsum"), sum($"d" * $"d").as("vsumsq"))
      .head()
    assert(t.count == e.getAs[Long]("cnt"))
    assert(t.vmin == e.getAs[Double]("vmin"))
    assert(t.vmax == e.getAs[Double]("vmax"))
    assert(t.positiveMin == e.getAs[Double]("pmin"))
    assert(math.abs(t.sum - e.getAs[Double]("vsum")) < 1e-9)
    assert(math.abs(t.sumSq - e.getAs[Double]("vsumsq")) < 1e-9)
  }
}
