package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** v29's greedy contract, proven independently of both engines: the
  * selection is re-checked step by step against a from-scratch
  * reimplementation of the MMR argmax over the exact candidate pool,
  * and the result is partition-invariant (flatMapGroups math only).
  */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(dir: String) =
    Catalog.queries("v29_mmr_rerank")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))

  test("v29 step-wise greedy dominance against an independent reimplementation") {
    import spark.implicits._
    val dir = TestSpark.sf0001
    // independent ground material: exact rel scores + vectors
    val e = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", graft.vec.VectorOps.toDouble($"embedding").as("v"))
      .as[(Long, Seq[Double])].collect().map { case (id, v) => id -> v.toArray }
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) {
        ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val got = rows(dir).groupBy(_._1)
    for ((qid, sel) <- got) {
      val qv = e(qid)
      // candidate pool: exact top-30 by (rel desc, id asc), from scratch
      val pool = e.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(v, qv)) }
        .sortBy(c => (-c._2, c._1)).take(30)
      val relOf = pool.toMap
      val ordered = sel.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1L to 10L),
        s"qid $qid ranks not 1..10: $ordered")
      assert(ordered.map(_._3).distinct.size == 10, s"qid $qid repeats a doc")
      val chosen = scala.collection.mutable.ArrayBuffer.empty[Long]
      for ((_, rank, vid, score) <- ordered) {
        assert(relOf.contains(vid),
          s"qid $qid rank $rank selected $vid outside the top-30 pool")
        def mmr(id: Long): Double =
          if (chosen.isEmpty) relOf(id)
          else 0.7 * relOf(id) -
            (1.0 - 0.7) * chosen.map(s => cos(e(id), e(s))).max
        val mine = mmr(vid)
        assert(math.floor(mine * 1e6 + 0.5) / 1e6 == score,
          s"qid $qid rank $rank score $score != recomputed $mine")
        // greedy dominance: nothing unchosen scores strictly better,
        // and ties resolve to the lowest id
        for ((oid, _) <- pool if oid != vid && !chosen.contains(oid)) {
          val other = mmr(oid)
          assert(other < mine || (other == mine && vid < oid),
            s"qid $qid rank $rank: $oid (mmr $other) beats chosen $vid ($mine)")
        }
        chosen += vid
      }
    }
  }

  test("v29 is partition-invariant across split configurations") {
    val a = graft.Tables.withConfs(spark,
        Seq("spark.sql.shuffle.partitions" -> "3")) {
      rows(TestSpark.sf0001).toSet
    }
    val b = graft.Tables.withConfs(spark,
        Seq("spark.sql.shuffle.partitions" -> "17")) {
      rows(TestSpark.sf0001).toSet
    }
    assert(a == b && a.nonEmpty)
  }
}
