package graft.operators

import graft.TestSpark
import graft.ml.KMeans
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The v28 maintenance contract (q38's merge-≡-recompute applied to the
  * ANN index) and the v27 filtered-search discipline.
  *
  * v28: the corpus grows by a delta generation; the index is maintained
  * by assigning ONLY the delta under the frozen base-trained quantizer
  * and appending. Correct maintenance means the maintained index is
  * indistinguishable from rebuilding the assignment over the full
  * corpus with the same quantizer — proven here at both levels
  * (assignment rows, probe output). The golden oracle pins the probe
  * itself; these tests pin WHY it is allowed to be incremental.
  *
  * v27: filtered ANN must pre-filter (predicate inside the pruned
  * scan), return only predicate-satisfying rows at any nprobe, and
  * keep useful recall under pruning.
  */
class IvfIncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def q(name: String) = Catalog.queries(name)(spark, dir)

  test("v28 maintained index == full reassignment under the frozen quantizer") {
    import spark.implicits._
    val (cents, _, _, merged) = VectorQueries.ivfIncIndex(spark, dir)
    val full = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", graft.vec.VectorOps.toDouble($"embedding").as("v"),
        KMeans.assign(graft.vec.VectorOps.toDouble($"embedding"), cents)
          .getField("cid").as("cell"))
    val m = merged.select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    val f = full.select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    assert(m == f, "incremental append diverged from recompute")
    assert(m.nonEmpty)
  }

  test("v28 probe through maintained index == probe through recomputed index") {
    import spark.implicits._
    val (cents, sample, _, _) = VectorQueries.ivfIncIndex(spark, dir)
    val full = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", graft.vec.VectorOps.toDouble($"embedding").as("v"),
        KMeans.assign(graft.vec.VectorOps.toDouble($"embedding"), cents)
          .getField("cid").as("cell"))
    val maintained = q("v28_ivf_incremental")
      .as[(Long, Long, Long, Double)].collect().toSet
    val recomputed = VectorQueries
      .ivfProbe(full, cents, sample, nprobe = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(maintained == recomputed)
    assert(maintained.nonEmpty)
  }

  test("v28 maintenance reads the base index from cache, not from parquet") {
    val (_, _, base, merged) = VectorQueries.ivfIncIndex(spark, dir)
    base.count() // materialize the stored index once
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      "maintained-index plan re-scans the base corpus instead of " +
        "reading the stored assignment — maintenance cost would be " +
        "corpus-proportional, not delta-proportional")
  }

  test("v27 rows satisfy the predicate at every nprobe (pre-filter, not post-trim)") {
    import spark.implicits._
    val labels = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    for (np <- Seq(4, 16)) {
      val rows = VectorQueries.filteredIvfProbe(spark, dir, np)
        .select($"qid", $"vec_id").as[(Long, Long)].collect()
      assert(rows.nonEmpty, s"np=$np returned nothing")
      for ((qid, vid) <- rows)
        assert(labels(vid) == labels(qid),
          s"np=$np returned vec $vid with label ${labels(vid)} for " +
            s"query $qid with label ${labels(qid)}")
    }
  }

  test("v27 filtered recall@10 at nprobe=8 >= 0.6 vs exact filtered top-k") {
    import spark.implicits._
    val exact = q("v27_filtered_knn") // all-cells probe == filtered brute force
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val pruned = VectorQueries.filteredIvfProbe(spark, dir, np = 8)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pruned).size.toDouble / exact.size
    info(s"filtered recall@10 (nprobe=8/16) = $recall")
    assert(recall >= 0.6, s"recall $recall below 0.6")
  }

  test("v30 filtered recall curve is monotone and exact at the full probe") {
    import spark.implicits._
    val rows = q("v30_filtered_recall_curve")
      .select($"nprobe", $"recall_ppm").as[(Long, Long)].collect()
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted,
      s"recall not monotone in nprobe: ${rows.toSeq}")
    assert(rows.last._2 == 1000000L,
      s"probing all cells must reach every filtered neighbor: ${rows.last}")
  }

  test("v27 heap fills from eligible candidates: full k rows per query where the class allows") {
    import spark.implicits._
    val counts = graft.Tables(spark, dir, "embeddings")
      .groupBy($"label").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    val labels = graft.Tables(spark, dir, "embeddings")
      .filter($"vec_id" < 5).select($"vec_id", $"label")
      .as[(Long, Int)].collect().toMap
    val perQ = q("v27_filtered_knn").groupBy($"qid")
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    for ((qid, lbl) <- labels) {
      val eligible = counts(lbl) - 1 // the query itself is excluded
      val want = math.min(10L, eligible)
      assert(perQ.getOrElse(qid, 0L) == want,
        s"query $qid returned ${perQ.getOrElse(qid, 0L)} of $want " +
          "eligible neighbors — a post-filter would under-fill here")
    }
  }
}
