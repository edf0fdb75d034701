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

  // all three engines — propagation, star, and the bounded driver
  // union-find dispatch — must label the same graph identically;
  // maxLocalEdges = 0 pins the distributed engine under test, the
  // default bound exercises the local one
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
      .run(nodes, edges.toDF("id_a", "id_b"), maxIter = 60,
        maxLocalEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got == unionFind(n, edges))
  }

  test("star algorithm equals union-find on the same random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 200
    val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b } ++
      (100L until 140L).map(i => (i, i + 1))
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val got = ConnectedComponents
      .run(nodes, edges.toDF("id_a", "id_b"), maxIter = 15, useStar = true,
        maxLocalEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got == unionFind(n, edges))
  }

  test("driver union-find dispatch equals union-find on the same random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 200
    val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b } ++
      (100L until 140L).map(i => (i, i + 1))
    val nodes = (0 until n).map(_.toLong).toDF("id")
    // default maxLocalEdges ≫ 100 edges → the local engine runs; a
    // 127-hop chain that needs 12 star rounds is one driver pass here
    val got = ConnectedComponents
      .run(nodes, edges.toDF("id_a", "id_b"), maxIter = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == unionFind(n, edges))
  }

  test("star converges logarithmically on a path where propagation needs diameter rounds") {
    import spark.implicits._
    val n = 128
    val chain = (0L until n - 1L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (0L until n).toDF("id")
    // min-propagation moves labels one hop per round: 12 rounds cannot
    // close a 127-hop path...
    intercept[IllegalArgumentException] {
      ConnectedComponents.run(nodes, chain, maxIter = 12, maxLocalEdges = 0L)
    }
    // ...the alternating star algorithm halves tree heights per round
    // and finishes well inside the same budget
    val got = ConnectedComponents.run(nodes, chain, maxIter = 12,
      useStar = true, maxLocalEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got == (0L until n).map(_ -> 0L).toMap)
  }

  test("ghost ids appearing only in edges never become labels") {
    import spark.implicits._
    val nodes = Seq(5L, 6L, 7L).toDF("id")
    // edge (0,5): 0 is not a node — without the endpoint semi-join its
    // smaller id would win the min race and label the {5,6} component
    val edges = Seq((0L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    // (engine, bound): propagation, star, and the local dispatch all
    // see the same pre-validated edge set
    for ((star, bound) <- Seq((false, 0L), (true, 0L), (false, 1L << 20))) {
      val got = ConnectedComponents.run(nodes, edges, useStar = star,
        maxLocalEdges = bound)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 7L),
        s"useStar=$star bound=$bound: $got")
    }
    // strict mode: the same ghost edge fails loudly instead of being
    // silently dropped (connectivity through a ghost is a data bug for
    // callers merging external edge sets)
    val e = intercept[IllegalArgumentException] {
      ConnectedComponents.run(nodes, edges, strictGhosts = true)
    }
    assert(e.getMessage.contains("strictGhosts"))
    // a clean edge set passes strict mode
    val ok = ConnectedComponents.run(nodes,
      Seq((5L, 6L)).toDF("id_a", "id_b"), strictGhosts = true)
      .as[(Long, Long)].collect().toMap
    assert(ok == Map(5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("d21 (star) dedup clusters equal d14 (propagation) on sf0.001") {
    val viaProp = graft.SparkEntry
      .queries("d14_dedup_clusters")(spark, TestSpark.sf0001).collect().toSet
    val viaStar = graft.SparkEntry
      .queries("d21_dedup_clusters_star")(spark, TestSpark.sf0001).collect().toSet
    assert(viaProp == viaStar)
    assert(viaProp.nonEmpty)
  }

  test("string-id graphs bypass the driver union-find (integral-id guard)") {
    import spark.implicits._
    // the local engine walks ids as longs; a string-id graph under the
    // default bound must fall through to the distributed engine, which
    // compares ids natively — "7" and "07" (which collide as longs)
    // stay distinct components, and nothing NPEs on the null casts
    val nodes = Seq("7", "07", "a", "b", "z").toDF("id")
    val edges = Seq(("7", "a"), ("07", "b")).toDF("id_a", "id_b")
    val got = ConnectedComponents.run(nodes, edges)
      .as[(String, String)].collect().toMap
    assert(got == Map("7" -> "7", "a" -> "7", "07" -> "07",
      "b" -> "07", "z" -> "z"), s"string-id labels wrong: $got")
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
      ConnectedComponents.run(chainNodes, chain, maxIter = 2,
        maxLocalEdges = 0L)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
