package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** 10×-scale verification for the golden-pinned queries.
  *
  * The driver's DuckDB gate proves all 126 queries at sf0.01, and the
  * sf0.1 oracle sweep re-proves every SQL-expressed oracle at ten times
  * that — but the 15 golden-gated queries (pinned VALUES tables) are
  * constants of the gate scale, so the 10× sweep is blind to them
  * (VERDICT r9 §missing 1). This spec closes that gap by re-running the
  * RECIPE that pinned each golden, at the sweep scale:
  *
  *  - partition invariance, the pinning premise for every golden
  *    (verified 8- vs 32-core before pinning): each query must be
  *    bit-identical under deliberately contrasting partitionings —
  *    few wide scan splits + 5 shuffle partitions vs many narrow
  *    splits + 32. A golden is only a constant of the fixture if no
  *    partial-aggregation order leaks into the output; this is the
  *    property that breaks first when someone introduces an
  *    unsnapped double fold.
  *  - cross-path equality where an independent second path exists at
  *    any SF: v11's disk-layout IVFADC probe must equal v09's
  *    in-memory probe (same golden by construction at sf0.01 — here
  *    re-proven at 10×), and g01's seeded generator rollup is
  *    dataset-independent, so its sf0.1 output must equal its sf0.01
  *    output (the very table the driver oracle-gates).
  *
  * The remaining non-circularity of the golden VALUES themselves is
  * carried by the algorithm checks that ran at pinning time and still
  * run every build (d10–d12 md5 siblings — SQL-oracled at sf0.1 by the
  * sweep, PQ/CDC plain-Scala reimplementations, v06 ≡ v01, sketch-error
  * specs); what this spec adds is the determinism-at-10× leg those
  * checks can't see.
  *
  * Scale dir override: SPARK_GRAFT_GOLDEN_SF (default sf0.1).
  */
class GoldenSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_GOLDEN_SF", "/root/testdata/sf0.1")

  /** The 15 golden-gated queries (every Catalog entry whose oracle is a
    * pinned GoldenOracles VALUES table). */
  private val goldenNames = Seq(
    "d06_minhash_lsh", "d07_simhash", "d08_fingerprints",
    "g01_gaussian_generator", "m05_kmeans_scalable_init",
    "n02_damds_embed", "q31_approx_stats",
    "v05_knn_ivf", "v08_knn_pq_adc", "v09_knn_ivfpq", "v11_knn_ivfpq_disk",
    "x02_image_features", "x04_media_dedup", "x05_audio_features",
    "x07_cdc_chunks")

  /** Canonical form: every row rendered (Row.toString keeps the -0.0 /
    * 0.0 distinction and full double precision), sorted. */
  private def canon(name: String, confs: Seq[(String, String)]): Seq[String] =
    Tables.withConfs(spark, confs) {
      Catalog.queries(name)(spark, sfDir).collect().map(_.toString).sorted.toSeq
    }

  private val wideSplits = Seq(
    "spark.sql.shuffle.partitions" -> "5",
    "spark.sql.files.maxPartitionBytes" -> "262144",
    "spark.sql.files.openCostInBytes" -> "0")
  private val narrowSplits = Seq(
    "spark.sql.shuffle.partitions" -> "32",
    "spark.sql.files.maxPartitionBytes" -> "134217728")

  for (name <- goldenNames)
    test(s"$name is partition-invariant at the sweep scale ($sfDir)") {
      val a = canon(name, wideSplits)
      val b = canon(name, narrowSplits)
      assert(a.nonEmpty, s"$name returned no rows at $sfDir")
      assert(a == b,
        s"$name output depends on partitioning at $sfDir — the " +
          s"golden-pinning premise is broken (${a.size} vs ${b.size} rows; " +
          s"first diff: ${a.zip(b).find(p => p._1 != p._2)})")
    }

  test("v11 disk-layout probe equals v09 in-memory probe at the sweep scale") {
    val mem = canon("v09_knn_ivfpq", narrowSplits)
    val disk = canon("v11_knn_ivfpq_disk", narrowSplits)
    assert(mem.nonEmpty && mem == disk,
      s"IVFADC disk path diverges from memory path at $sfDir")
  }

  test("g01 seeded generator rollup is dataset-independent (sf0.1 ≡ sf0.01)") {
    val at10x = canon("g01_gaussian_generator", narrowSplits)
    val atGate = Catalog.queries("g01_gaussian_generator")(
      spark, TestSpark.sf001).collect().map(_.toString).sorted.toSeq
    assert(at10x == atGate,
      "seeded generator output varies with the sf dir — it must be a " +
        "constant of the seed alone")
  }
}
