package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** s29's contract: the streamed IVF probe (in-plan cell ranking +
  * stream-static cell join + bounded heap state) is value-identical to
  * the batch probe, at any scale — the golden only pins the gate
  * scale, this proves the equivalence live against batch v05, and the
  * in-plan HOF cell ranking is isolated against the driver math it
  * replaces.
  */
class StreamAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("s29 streamed ANN probe equals batch v05 bit-for-bit (sf0.001)") {
    import spark.implicits._
    val batch = Catalog.queries("v05_knn_ivf")(spark, TestSpark.sf0001)
      .as[(Long, Long, Long, Double)].collect().toSet
    val stream = Catalog.queries("s29_stream_ann_search")(spark, TestSpark.sf0001)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"streamed probe diverged: only-stream=${stream -- batch}, " +
        s"only-batch=${batch -- stream}")
  }

  test("s29 in-plan cell ranking selects exactly the driver-ranked probe cells") {
    import spark.implicits._
    val (cents, sample, _) = VectorQueries.ivfIndex(spark, TestSpark.sf0001)
    // the driver ranking the HOF replaces (the ivfProbe recipe)
    val driverCells = sample.filter(_._1 < 5).flatMap { case (qid, qv) =>
      cents.zipWithIndex.map { case (c, i) =>
        (c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }.sortBy(x => (x._1, x._2)).take(4).map(c => (qid, c._2))
    }.toSet
    // synthetic corpus: one row per cell whose vec_id encodes the cell,
    // so the probe's survivors identify exactly the planned cells
    // (constant v ⇒ equal scores; k=10 > np=4 keeps all; tiebreak by id)
    val oneRowPerCell = cents.indices
      .map(c => (c, 1000L + c, Seq.fill(64)(1.0))).toDF("cell", "vec_id", "v")
    val raw = graft.Tables(spark, TestSpark.sf0001, "embeddings")
    val got = VectorQueries.annProbeRender(
        VectorQueries.annProbeHeapStream(raw, cents, oneRowPerCell, np = 4))
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .map { case (q, v) => (q, (v - 1000L).toInt) }.toSet
    assert(got == driverCells,
      s"in-plan ranking diverged from driver ranking: " +
        s"only-plan=${got -- driverCells}, only-driver=${driverCells -- got}")
  }
}
