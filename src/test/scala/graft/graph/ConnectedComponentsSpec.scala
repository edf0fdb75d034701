package graft.graph

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("labels equal union-find on a random graph (chains force rounds)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 200
    // sparse random edges + a long chain (worst-case diameter path)
    val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b } ++
      (100L until 140L).map(i => (i, i + 1))
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val got = ConnectedComponents
      .run(nodes, edges.toDF("id_a", "id_b"), maxIter = 60)
      .as[(Long, Long)].collect().toMap
    assert(got == unionFind(n, edges))
  }

  test("singletons keep themselves; maxIter too small fails loudly") {
    import spark.implicits._
    val nodes = Seq(0L, 1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((3L, 4L)).toDF("id_a", "id_b")
    val got = ConnectedComponents.run(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L))

    val chain = (0L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val chainNodes = (0L to 10L).toDF("id")
    val e = intercept[IllegalArgumentException] {
      ConnectedComponents.run(chainNodes, chain, maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
