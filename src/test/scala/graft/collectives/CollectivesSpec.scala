package graft.collectives

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CollectivesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("reduce merges all partitions (C1)") {
    import spark.implicits._
    val ds = spark.range(1, 1001).map(_.toLong).repartition(8)
    assert(Collectives.reduce[Long](ds, _ + _) == 500500L)
  }

  test("allReduce result is visible inside every task (C2)") {
    import spark.implicits._
    val ds = spark.createDataset(Seq.fill(16)(Array(1.0, 2.0))).repartition(4)
    val bc = Collectives.allReduce[Array[Double]](spark, ds, Collectives.vectorSum)
    assert(bc.value.toSeq == Seq(16.0, 32.0))
    // every task reads the broadcast value
    val seen = spark.range(0, 8).mapPartitions { it =>
      it.map(_ => bc.value.sum)
    }.collect()
    assert(seen.forall(_ == 48.0))
  }

  test("vectorSum accumulates (not the reference Point2.add overwrite bug)") {
    val s = Collectives.vectorSum(Array(1.0, 2.0), Array(3.0, 4.0))
    assert(s.toSeq == Seq(4.0, 6.0))
  }

  test("vectorDivide scales elementwise (N12 divide)") {
    val d = Collectives.vectorDivide(Array(4.0, -6.0, 0.0), 4.0)
    assert(d.toSeq == Seq(1.0, -1.5, 0.0))
  }
}
