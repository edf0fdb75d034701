package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d63's maintenance contract: the pairs the maintained index knows
  * (base-generation pairs from the stored index, plus everything the
  * delta introduces) are EXACTLY the full-recompute d10 pairs — and
  * the maintained path never re-hashes the base.
  */
class IncrementalNeardupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id_a"), col("id_b"), col("n_bands"), col("est_jaccard"))
      .collect().map(_.toSeq).toSet

  test("maintained index pairs == full recompute (base pairs + delta-introduced)") {
    val baseSigs = TextQueries.neardupSigIndex(spark, dir)
    val baseBanded = TextQueries.mhBandedOf(baseSigs)
    // pairs the index already knew: base self-join (the pre-delta run)
    val basePairs = TextQueries.mhPairsRollup(
      baseBanded.as("x").join(baseBanded.as("y"),
          col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc") < col("y.doc"))
        .select(col("x.doc").as("id_a"), col("y.doc").as("id_b")),
      baseSigs)
    val introduced = Catalog.queries("d63_incremental_neardup")(spark, dir)
    val maintained = pairSet(basePairs) ++ pairSet(introduced)
    val recompute = pairSet(Catalog.queries("d10_minhash_lsh_md5")(spark, dir))
    assert(maintained == recompute,
      s"maintained != recompute: only-maintained=" +
        s"${maintained -- recompute}, only-recompute=${recompute -- maintained}")
    assert(pairSet(introduced).nonEmpty, "delta introduced no pairs — " +
      "the fixture split is vacuous")
    // both provenance classes occur at this scale (split calibration)
    val statuses = introduced.select(col("status")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(statuses == Set("delta_delta", "delta_vs_base"),
      s"expected both provenance classes, got $statuses")
  }

  test("d63 reads the base signatures from the persisted index, not a re-hash") {
    TextQueries.neardupSigIndex(spark, dir).count() // warm the stored index
    val plan = Catalog.queries("d63_incremental_neardup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"maintained path re-hashes the base generation:\n$plan")
  }

  test("s31 streamed probe equals the batch delta-vs-base slice of d63") {
    val stream = pairSet(
      Catalog.queries("s31_stream_neardup_probe")(spark, dir))
    val batch = pairSet(
      Catalog.queries("d63_incremental_neardup")(spark, dir)
        .filter(col("status") === "delta_vs_base"))
    assert(stream == batch,
      s"streamed probe diverged: only-stream=${stream -- batch}, " +
        s"only-batch=${batch -- stream}")
    assert(stream.nonEmpty)
  }
}
