package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of v21 (PageRank centrality over the v14 kNN graph). The
  * cross-engine gate proves Spark ≡ DuckDB on the exact integer
  * masses; these cases prove the micro-mass power iteration means
  * what PageRank means on a graph with known structure.
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("v21 mass identity: every node keeps the base, only in-neighbors add to it") {
    import spark.implicits._
    val rank = Catalog.queries("v21_knn_pagerank")(spark, dir)
      .select($"vec_id", $"mass").as[(Long, Long)].collect().toMap
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rank.size == n, s"every vector must be ranked: ${rank.size} vs $n")
    // the flat restart term is a hard floor; only nodes something
    // points AT can exceed it, and nodes nothing points at sit on it
    val receivers = Catalog.queries("v14_knn_graph")(spark, dir)
      .select($"nbr").as[Long].collect().toSet
    rank.foreach { case (id, m) =>
      assert(m >= 150000L, s"node $id below the restart base: $m")
      if (!receivers.contains(id))
        assert(m == 150000L, s"isolated node $id accrued mass $m")
      else assert(m > 150000L, s"receiver $id stuck at the base")
    }
    // floor division and dropped dangling mass only ever SHED mass, so
    // the total can never exceed the initial allocation
    assert(rank.values.sum <= n * 1000000L,
      s"mass created from nothing: ${rank.values.sum} > ${n * 1000000L}")
  }

  test("v21 is exactly repeatable (integer masses, memoized edge set)") {
    import spark.implicits._
    val a = Catalog.queries("v21_knn_pagerank")(spark, dir)
      .select($"vec_id", $"mass").as[(Long, Long)].collect().sorted
    val b = Catalog.queries("v21_knn_pagerank")(spark, dir)
      .select($"vec_id", $"mass").as[(Long, Long)].collect().sorted
    assert(a.sameElements(b), "two invocations diverged")
  }
}
