package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** v35's synchronous label propagation against an independent
  * plain-Scala replay of the same rounds on the same collected edge
  * set — the oracle proves cross-engine agreement, this proves the
  * distributed joins/aggs implement the ALGORITHM (most-frequent
  * neighbor label, smallest-label tiebreak, isolated nodes keep their
  * own, 4 synchronous rounds), not merely something both engines
  * compute alike.
  */
class LpaCommunitiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("v35 equals a plain-Scala synchronous LPA replay at sf0.001") {
    import spark.implicits._
    val dir = TestSpark.sf0001
    val got = Catalog.queries("v35_lpa_communities")(spark, dir)
      .select($"vec_id", $"community", $"csize")
      .as[(Long, Long, Long)].collect().toSeq
    // bounded gathers — a few hundred nodes / a few thousand edges at
    // the gate scale; TEST-ONLY device, the engine never collects
    val edges = VectorQueries.knnGraph(spark, dir, 5)
      .select($"vec_id", $"nbr").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSeq }
    val nodes = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id").as[Long].collect().sorted.toSeq
    var lbl = nodes.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      val next = nodes.map { v =>
        edges.get(v) match {
          case Some(ns) if ns.nonEmpty =>
            val counts = ns.groupBy(lbl).map { case (l, g) => (l, g.size) }
            // max count, then smallest label
            v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
          case _ => v -> lbl(v)
        }
      }.toMap
      lbl = next
    }
    val sizes = lbl.values.groupBy(identity).map { case (l, g) => l -> g.size.toLong }
    val expected = nodes.map(v => (v, lbl(v), sizes(lbl(v)))).toSet
    assert(got.toSet == expected,
      s"LPA diverges from the replay:\nextra=${got.toSet -- expected}\n" +
        s"missing=${expected -- got.toSet}")
    // communities must be non-trivial on this fixture: more than one,
    // fewer than the node count
    val nComm = got.map(_._2).distinct.size
    assert(nComm > 1 && nComm < nodes.size, s"degenerate communities: $nComm")
  }
}
