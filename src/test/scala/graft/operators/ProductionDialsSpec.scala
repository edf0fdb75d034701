package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** The oracle gates run operators at oracle-friendly dials (w = 4
  * token chunks, graphK = 5) on the gate fixture; production runs them
  * at the published dials on far more data. These cases re-run the
  * engines at the production dials on the 10× fixture and pin that the
  * PLAN SHAPE is dial-independent: the same shuffle keys, id-only
  * exchanges, no window-over-corpus — so cranking a dial can never
  * quietly change the scale class of the operator (VERDICT r9 item 5).
  */
class ProductionDialsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf01 = "/root/testdata/sf0.1"

  /** Run `body` with AQE off: exchanges only appear in the pre-AQE
    * executedPlan (the existing PlanDisciplineSpec discipline). */
  private def noAqe[A](body: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  /** Hash-shuffle key column-name signature of a plan (set of sorted
    * key-name lists, expr-ids stripped) — "no new exchange types"
    * compares these across dials. */
  private def shuffleSig(df: DataFrame): Set[Seq[String]] =
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec =>
        e.outputPartitioning match {
          case hp: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            hp.expressions.map(_.references.map(_.name).toSeq.sorted.mkString(","))
              .sorted.toSeq
          case other => Seq(other.getClass.getSimpleName)
        }
    }.toSet

  test("d25/d27 chunk dedup at the production window (w≈50) keeps the w=4 plan shape") {
    val docs = Tables(spark, sf01, "documents")
    val prod = graft.text.TextOps.chunkDedup(docs, "doc_id", "text", 50)
    noAqe {
      val gate = graft.text.TextOps.chunkDedup(docs, "doc_id", "text", 4)
      assert(shuffleSig(prod) == shuffleSig(gate),
        s"w=50 changed the shuffle keys: ${shuffleSig(prod)} vs ${shuffleSig(gate)}")
      val p = prod.queryExecution.executedPlan.toString
      assert(p.contains("hashpartitioning(chunk"), s"no chunk-key shuffle:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"all-pairs stage at w=50:\n$p")
    }
    // and the apply form, executed: w=50 on real text yields few
    // duplicate windows (Lee et al.'s regime) but must stay consistent
    val out = prod.collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("n_dup_chunks") <= r.getAs[Long]("n_chunks")))
    val applied = graft.text.TextOps.chunkDedupApply(docs, "doc_id", "text", 50)
    noAqe {
      val ap = applied.queryExecution.executedPlan.toString
      assert(!ap.contains("rangepartitioning"),
        s"apply form grew a global sort at w=50:\n$ap")
    }
    assert(applied.count() > 0)
  }

  test("v14 kNN graph at production k=10 on sf0.1 keeps id-only exchanges") {
    val prod = VectorQueries.knnGraph(spark, sf01, 10)
    noAqe {
      val gate = VectorQueries.knnGraph(spark, sf01, 5)
      assert(shuffleSig(prod) == shuffleSig(gate),
        s"k=10 changed the shuffle keys: ${shuffleSig(prod)} vs ${shuffleSig(gate)}")
      // the v04 discipline at the production dial: no shuffle carries a
      // vector column, and per-vector top-k is the bounded-heap agg,
      // not a window over the corpus
      val shuffles = prod.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.nonEmpty)
      shuffles.foreach { e =>
        assert(!e.output.exists(_.dataType.typeName.startsWith("array")),
          s"exchange carries an array column at k=10: ${e.output}")
      }
      assert(!prod.queryExecution.executedPlan.toString.contains("Window"),
        "per-vector top-k planned as a window at k=10")
    }
    val byVec = prod.groupBy("vec_id").count().collect()
    assert(byVec.nonEmpty && byVec.forall(_.getAs[Long]("count") <= 10))
  }

  test("DSIR family at the production feature space (irBuckets=65536) keeps the bounded shapes") {
    // d38/d39 gate at 4096 hash buckets; published DSIR feature spaces
    // are 10k+. Re-run both engines at 65536 on the 10× fixture and
    // pin that the scale class never moves: the classifier stays a
    // map-only projection, the llr table stays a bounded driver array
    // feeding a broadcast, the scoring agg keeps the 4096-dial shuffle
    // keys, and the stateless scorer still equals the join form.
    val docs = Tables(spark, sf01, "documents")
    noAqe {
      val p = TextQueries.qualityClassify(docs, 65536)
        .queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"d38 at 64k buckets shuffles:\n$p")
      assert(!p.contains("Generate"), s"d38 at 64k buckets explodes:\n$p")
    }
    val (hist, llr) = TextQueries.dsirIndex(spark, sf01, 65536)
    assert(llr.length == 65536, "llr array must span the production space")
    val prod = TextQueries.importanceResample(spark, sf01, 65536)
    noAqe {
      val gate = TextQueries.importanceResample(spark, sf01, 4096)
      assert(shuffleSig(prod) == shuffleSig(gate),
        s"64k buckets changed the shuffle keys: ${shuffleSig(prod)} vs ${shuffleSig(gate)}")
      val p = prod.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), s"llr join not broadcast at 64k:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("Window") &&
        !p.contains("rangepartitioning"),
        s"sort/window crept into the 64k scoring plan:\n$p")
    }
    // value identity of the stateless array scorer at the big dial —
    // the s14 contract is not a 4096-only accident
    val stateless = TextQueries.importanceScoreStateless(docs, llr, 65536)
    assert(prod.exceptAll(stateless).isEmpty &&
      stateless.exceptAll(prod).isEmpty,
      "stateless scorer diverges from the join form at 64k buckets")
    // structural skew bound: the per-doc histogram caps any single
    // document's contribution to the doc_id agg at `buckets` rows,
    // however long the document — the mega-doc skew pin
    val maxRows = hist.groupBy(org.apache.spark.sql.functions.col("doc_id"))
      .count().agg(org.apache.spark.sql.functions.max("count"))
      .head.getLong(0)
    assert(maxRows <= 65536, s"per-doc histogram rows $maxRows exceed the bucket bound")
  }

  test("bigram LM at the production feature space (64k buckets) stays a stateless scorer") {
    // d44 gates at 4096 buckets; a production bigram space wants far
    // more. Re-train at 65536 on the 10× fixture and pin that the
    // scale class never moves: the index stays a bounded driver
    // gather, and the scorer stays a map-only projection — the s16
    // stream contract is not a 4096-only accident.
    val (lnc, lnd) = TextQueries.bigramLmIndex(spark, sf01, 65536)
    assert(lnc.length == 65536 && lnd.length == 65536,
      "LM arrays must span the production space")
    noAqe {
      val p = TextQueries.perplexityScoreStateless(
        Tables(spark, sf01, "documents"), lnc, lnd)
        .queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"LM scorer at 64k shuffles:\n$p")
      assert(!p.contains("Generate"), s"LM scorer at 64k explodes:\n$p")
    }
  }

  test("CC cluster-size count partial-aggregates before the label exchange (skew pin)") {
    // d14/d21/v10 all count cluster sizes with groupBy(label).count —
    // hash-agg partials upstream of the exchange keep a giant dup
    // cluster from serializing through one task. A rewrite to
    // count().over(Window.partitionBy(label)) would pass the oracle
    // and break at scale; pin the partial-agg shape for all three.
    for (name <- Seq("d14_dedup_clusters", "d21_dedup_clusters_star",
        "v10_semantic_dedup")) {
      val p = Catalog.auditPlan(spark, graft.TestSpark.sf0001, name).toString
      assert(!p.contains("Window"),
        s"$name: cluster-size count planned as a window:\n$p")
      assert("HashAggregate\\(keys=\\[label[#\\d]*L?\\], functions=\\[partial_count"
        .r.findFirstIn(p).isDefined,
        s"$name: no partial_count before the label exchange:\n$p")
    }
  }
}
