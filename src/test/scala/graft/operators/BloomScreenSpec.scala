package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic and deployment guards for the d57/s23 Bloom
  * decontamination screen beyond the oracle gate. */
class BloomScreenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Bloom screen dominates the exact screen and its FPs are real") {
    // a Bloom filter can only over-approximate membership: every exact
    // hit must also be a bloom hit, and the fixture must actually
    // exercise the false-positive branch (the fp_ppm column is the
    // whole point of the audit — a 0-FP fixture would leave it
    // untested)
    val rows = Catalog.queries("d57_bloom_contamination")(
      spark, TestSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bloom_hits") >= r.getAs[Long]("n_exact_hits"),
        s"bloom under-approximates on doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("fp_ppm") >= 0L)
    }
    val fp = rows.map(r =>
      r.getAs[Long]("n_bloom_hits") - r.getAs[Long]("n_exact_hits")).sum
    assert(fp > 0, "fixture assumption: deterministic FPs exist at 2^16 bits")
  }

  test("stateless bitmap screen equals the join form on the shared columns") {
    // the s23 deployment contract: three O(1) bit probes against the
    // 1024-long literal must reproduce the join form's verdicts
    // bit-for-bit (same hash construction, same bit set)
    val dir = TestSpark.sf001
    val bits = TextQueries.bloomBitmap(spark, dir)
    val stateless = TextQueries.bloomScreenStateless(
      graft.Tables(spark, dir, "documents").filter($"doc_id" >= 20), bits)
    val joinForm = Catalog.queries("d57_bloom_contamination")(spark, dir)
      .select($"doc_id", $"total_5grams", $"n_bloom_hits")
    assert(joinForm.exceptAll(stateless).isEmpty &&
      stateless.exceptAll(joinForm).isEmpty,
      "bitmap screen diverges from the join form")
  }

  test("stateless bitmap screen is map-only: no Exchange, no Generate") {
    val dir = TestSpark.sf0001
    val bits = TextQueries.bloomBitmap(spark, dir)
    val p = TextQueries.bloomScreenStateless(
      graft.Tables(spark, dir, "documents"), bits)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"stateless bloom screen shuffles:\n$p")
    assert(!p.contains("Generate"), s"stateless bloom screen explodes:\n$p")
  }
}
