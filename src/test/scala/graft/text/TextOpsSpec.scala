package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("identical normalized text yields identical minhash signature") {
    import spark.implicits._
    val df = Seq(
      (1L, "The quick  brown fox jumps over the lazy dog today"),
      (2L, "the QUICK brown   fox jumps over the lazy dog today"),
      (3L, "a completely different document about spark engines here"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .withColumn("sh", TextOps.shingles("toks", 3))
      .withColumn("sig", TextOps.minhashSignature("sh", 16))
    val sigs = df.select($"doc_id", $"sig").as[(Long, Seq[Long])]
      .collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("estimateJaccard = 1.0 for identical docs via LSH candidates") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .withColumn("sh", TextOps.shingles("toks", 3))
    val sigs = docs.withColumn("sig", TextOps.minhashSignature("sh", 16))
      .select($"doc_id", $"sig")
    val cands = TextOps.lshCandidates(sigs, "doc_id", 16, bands = 4)
    val est = TextOps.estimateJaccard(cands, sigs, "doc_id", 16)
      .select($"id_a", $"id_b", $"est_jaccard")
      .as[(Long, Long, Double)].collect()
    assert(est.exists(r => r._1 == 1L && r._2 == 2L && r._3 == 1.0))
    assert(!est.exists(r => r._2 == 3L || r._1 == 3L))
  }

  test("simhash: identical text -> hamming 0; different text -> large hamming") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark engines process large datasets with distributed aggregation"),
      (2L, "spark engines process large datasets with distributed aggregation"),
      (3L, "completely unrelated words about gardening tulips daffodils roses"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .select($"doc_id", TextOps.simhash64("toks").as("h"))
    val h = df.as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) > 10)
  }

  test("simhashBands: h-hamming pair shares a band when h < bands (pigeonhole)") {
    import spark.implicits._
    val x = 0x0123456789abcdefL
    val y = x ^ (1L << 3) ^ (1L << 40) ^ (1L << 63) // hamming 3
    val df = Seq(x, y).toDF("h")
      .select(TextOps.simhashBands($"h", 4).as("codes"))
      .as[Seq[Long]].collect()
    assert(df(0).toSet.intersect(df(1).toSet).nonEmpty)
    // and codes are namespaced per band: 4 distinct entries each
    assert(df(0).length == 4 && df(0).distinct.length == 4)
  }

  test("d07 banded candidates are a superset of the old single-prefix buckets") {
    import spark.implicits._
    // any two hashes with identical top-16 bits (old bucket) share band 3
    val a = 0x7fff000000000001L
    val b = 0x7fff0000ffff0000L
    val df = Seq(a, b).toDF("h")
      .select(TextOps.simhashBands($"h", 4).as("codes")).as[Seq[Long]].collect()
    assert(df(0)(3) == df(1)(3))
  }

  test("d06 LSH candidates cover all high-Jaccard pairs found exactly by d05") {
    import spark.implicits._
    // the oracle-checked d05 computes EXACT shingle-Jaccard on a slice;
    // the production d06 must recover its strong pairs (j >= 0.8 ->
    // per-band hit 1-(1-j^4)^8 > 0.97; j = 1.0 pairs are guaranteed)
    val d05 = graft.operators.TextQueries.all.find(_.name == "d05_ngram_jaccard").get
    val d06 = graft.operators.TextQueries.all.find(_.name == "d06_minhash_lsh").get
    val strong = d05.fn(spark, TestSpark.sf0001)
      .filter($"jaccard" >= 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(strong.nonEmpty, "fixture has no strong near-dup pairs in the slice")
    val lsh = d06.fn(spark, TestSpark.sf0001)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(strong.subsetOf(lsh),
      s"d06 missed strong pairs: ${strong -- lsh}")
  }

  test("fingerprints are deterministic and reorder-sensitive only at edges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val fp = TextOps.fingerprints(docs, "doc_id", "text")
      .select($"doc_id", $"full_hash", $"min_shingle_hash")
      .as[(Long, Long, Long)].collect()
    assert(fp(0)._2 == fp(1)._2 && fp(0)._3 == fp(1)._3)
  }

  test("d15 hash split: deterministic, exhaustive, ~80/10/10 proportions") {
    import spark.implicits._
    val q = graft.operators.TextQueries.all.find(_.name == "d15_hash_split").get
    val a = q.fn(spark, graft.TestSpark.sf001)
      .select($"doc_id", $"split").as[(Long, String)].collect()
    val b = q.fn(spark, graft.TestSpark.sf001)
      .select($"doc_id", $"split").as[(Long, String)].collect()
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1))) // rerun-stable
    assert(a.map(_._1).distinct.length == a.length) // one split per doc
    val frac = a.groupBy(_._2).view.mapValues(_.length.toDouble / a.length).toMap
    assert(math.abs(frac("train") - 204.0 / 256) < 0.06, frac.toString)
    assert(math.abs(frac("val") - 26.0 / 256) < 0.04, frac.toString)
    assert(math.abs(frac("test") - 26.0 / 256) < 0.04, frac.toString)
  }

  test("d31 novelty: first doc scores 1, bounds hold, dup text scores 0") {
    import spark.implicits._
    val q = graft.operators.TextQueries.all.find(_.name == "d31_ngram_novelty").get
    val rows = q.fn(spark, graft.TestSpark.sf0001)
      .select($"doc_id", $"n_grams", $"novel", $"novelty")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((id, n, novel, ratio) <- rows) {
      assert(novel >= 0 && novel <= n, s"doc $id")
      assert(ratio >= 0.0 && ratio <= 1.0, s"doc $id")
    }
    // the lowest doc_id in the output is, by min-first_doc construction,
    // the first occurrence of every one of its grams
    val first = rows.minBy(_._1)
    assert(first._3 == first._2 && first._4 == 1.0, first.toString)
    // a verbatim copy of an earlier doc contributes zero novel grams
    val docs = spark.read.parquet(s"${graft.TestSpark.sf0001}/documents.parquet")
    val copied = docs.select($"doc_id", $"text")
      .union(docs.filter($"doc_id" === 0)
        .select(lit(999999L).as("doc_id"), $"text"))
    val sh = copied
      .select($"doc_id", graft.text.TextOps.tokens($"text").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(graft.text.TextOps.shingles("toks", 3)).as("sh"))
    val firstSeen = sh.groupBy($"sh").agg(min($"doc_id").as("first_doc"))
    val copyNovel = sh.join(firstSeen, "sh")
      .filter($"doc_id" === 999999L)
      .agg(sum(($"first_doc" === $"doc_id").cast("long")).as("novel"))
      .as[Long].head()
    assert(copyNovel == 0L)
  }

  test("d32 vocab growth: conservation, monotone cumulative, bucket coverage") {
    import spark.implicits._
    val q = graft.operators.TextQueries.all.find(_.name == "d32_vocab_growth").get
    val rows = q.fn(spark, graft.TestSpark.sf001)
      .select($"bucket", $"n_tokens", $"new_terms", $"cum_vocab")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    // cumulative = running sum of new_terms, monotone non-decreasing
    var run = 0L
    for ((_, _, nt, cum) <- rows) { run += nt; assert(cum == run) }
    // total new terms across buckets = corpus-wide distinct vocabulary
    val docs = spark.read.parquet(s"${graft.TestSpark.sf001}/documents.parquet")
      .filter(length(trim($"text")) > 0)
    val vocab = docs
      .select(explode(graft.text.TextOps.tokens($"text")).as("term"))
      .select(countDistinct($"term")).as[Long].head()
    assert(rows.map(_._3).sum == vocab)
    // token conservation across buckets
    val totalToks = docs
      .select(sum(size(graft.text.TextOps.tokens($"text")))).as[Long].head()
    assert(rows.map(_._2).sum == totalToks)
  }

  test("d33 drops exactly the docs d23 scores at/above tau, keeps text intact") {
    import spark.implicits._
    def q(n: String) = graft.operators.TextQueries.all.find(_.name == n).get
    val scored = q("d23_contamination").fn(spark, graft.TestSpark.sf001)
      .select($"doc_id", $"contamination").as[(Long, Double)].collect().toMap
    val kept = q("d33_decontam_apply").fn(spark, graft.TestSpark.sf001)
      .select($"doc_id", $"text_md5").as[(Long, String)].collect().toMap
    val docs = spark.read.parquet(s"${graft.TestSpark.sf001}/documents.parquet")
      .select($"doc_id", md5($"text".cast("binary")).as("m"))
      .as[(Long, String)].collect().toMap
    val dropped = scored.filter(_._2 >= 0.05).keySet
    assert(dropped.forall(id => !kept.contains(id)))
    // every non-eval doc not dropped is kept — including unscoreable ones
    val expected = docs.keySet.filter(_ >= 20) -- dropped
    assert(kept.keySet == expected)
    // the emitted corpus is the original text, byte-identical
    kept.foreach { case (id, m) => assert(m == docs(id), s"doc $id") }
  }

  test("d34 incremental dedup composes to the full-corpus ledger") {
    import spark.implicits._
    def q(n: String) = graft.operators.TextQueries.all.find(_.name == n).get
    // the ground truth an offline full-corpus dedup would produce,
    // under the same word-set signature
    val full = spark.read
      .parquet(s"${graft.TestSpark.sf0001}/documents.parquet")
      .filter(length(trim($"text")) > 0)
      .select($"doc_id", graft.operators.TextQueries.bowSig($"text").as("sig"))
      .groupBy($"sig").agg(min($"doc_id").as("keeper"))
      .as[(String, Long)].collect().toMap
    val inc = q("d34_incremental_dedup").fn(spark, graft.TestSpark.sf0001)
      .select($"doc_id", $"sig", $"status", $"keeper")
      .as[(Long, String, String, Long)].collect()
    assert(inc.nonEmpty && inc.forall(_._1 >= 400))
    // all three verdicts are actually exercised by the fixture
    assert(inc.map(_._3).toSet ==
      Set("dup_of_history", "dup_in_batch", "new_keeper"))
    // every batch doc resolves to exactly the full-corpus keeper
    inc.foreach { case (doc, sig, _, keeper) =>
      assert(keeper == full(sig), s"doc $doc") }
    // the ledger update (new_keeper rows) is exactly the set of sigs
    // whose full-corpus keeper lives in the batch
    val newKeepers = inc.filter(_._3 == "new_keeper")
      .map(r => (r._2, r._4)).toSet
    assert(newKeepers == full.filter(_._2 >= 400).toSet)
    // statuses partition the batch correctly
    inc.foreach { case (doc, sig, status, keeper) =>
      status match {
        case "dup_of_history" => assert(keeper < 400)
        case "dup_in_batch" => assert(keeper >= 400 && keeper < doc)
        case "new_keeper" => assert(keeper == doc)
      }
    }
  }

  test("d37 keeps near-dup clusters in one split where d15 would separate them") {
    import spark.implicits._
    def q(n: String) = graft.operators.TextQueries.all.find(_.name == n).get
    val rows = q("d37_leakage_safe_split").fn(spark, graft.TestSpark.sf001)
      .select($"doc_id", $"keeper", $"split")
      .as[(Long, Long, String)].collect()
    // coherence: one split per cluster
    rows.groupBy(_._2).foreach { case (k, members) =>
      assert(members.map(_._3).distinct.length == 1, s"cluster $k") }
    // the guard is non-vacuous: some dup doc's OWN-ID d15 split differs
    // from its cluster split — exactly the leakage d15 alone permits
    val d15Split = q("d15_hash_split").fn(spark, graft.TestSpark.sf001)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val dups = rows.filter(r => r._1 != r._2)
    assert(dups.nonEmpty)
    assert(dups.exists(r => d15Split(r._1) != r._3),
      "no dup doc would have leaked under the id-hash split — fixture " +
        "no longer exercises the guard")
  }

  test("d19 sampling is independent of the d15 split decision") {
    import spark.implicits._
    // d19 salts its hash (doc_id || ':sample'); d15 hashes the bare id.
    // If the two shared a hash byte, sampling at rate 230 would keep
    // exactly train+val and ZERO test docs. Independence means every
    // split is represented in the sample, and each stratum's sampled
    // split mix roughly matches the split priors.
    val split = graft.operators.TextQueries.all
      .find(_.name == "d15_hash_split").get
      .fn(spark, graft.TestSpark.sf001).select($"doc_id", $"split")
    val sample = graft.operators.TextQueries.all
      .find(_.name == "d19_stratified_sample").get
      .fn(spark, graft.TestSpark.sf001).select($"doc_id")
    val mix = sample.join(split, "doc_id")
      .groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(mix.keySet == Set("train", "val", "test"), mix.toString)
    val n = mix.values.sum.toDouble
    assert(math.abs(mix("train") / n - 204.0 / 256) < 0.08, mix.toString)
  }

  test("d16 packing equals a sequential greedy reference per shard") {
    import spark.implicits._
    val q = graft.operators.TextQueries.all.find(_.name == "d16_sequence_pack").get
    val rows = q.fn(spark, graft.TestSpark.sf001)
      .select($"doc_id", $"shard", $"n_tokens", $"bin")
      .as[(Long, Long, Long, Long)].collect()
    val budget = 1024L
    // independent sequential replay of greedy stream chunking
    val ref = rows.groupBy(_._2).toSeq.flatMap { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).toSeq.map { case (id, _, n, _) =>
        val bin = cum / budget
        cum += n
        (id, bin)
      }
    }.toMap
    rows.foreach { case (id, _, _, bin) =>
      assert(bin == ref(id), s"doc $id: got bin $bin, reference ${ref(id)}")
    }
    // sanity: packing actually happens (bins hold multiple docs)
    assert(rows.groupBy(r => (r._2, r._4)).values.exists(_.size > 1))
  }

  test("chunkDedup: injected exact copy is fully flagged, keeper untouched") {
    import spark.implicits._
    // doc 0 and its exact copy (doc 10): every chunk of the copy is a
    // duplicate of the original's keeper chunks; doc 20 is made of
    // words no other doc uses, so nothing in it can be flagged
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (20L, "iota kappa lambda mu nu xi omicron pi")
    ).toDF("doc_id", "text")
    val out = graft.text.TextOps.chunkDedup(docs, "doc_id", "text", 4)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 2L, 0L, 0.0)), s"keeper doc flagged: ${out(0L)}")
    assert(out(10L) == ((10L, 2L, 2L, 1.0)), s"copy not fully flagged: ${out(10L)}")
    assert(out(20L) == ((20L, 2L, 0L, 0.0)), s"unique doc flagged: ${out(20L)}")
    // within-doc repetition: the second occurrence inside the SAME doc
    // is a duplicate of the first (keeper = lowest chunk_idx)
    val rep = Seq((5L, "a b c d a b c d")).toDF("doc_id", "text")
    val r = graft.text.TextOps.chunkDedup(rep, "doc_id", "text", 4)
      .as[(Long, Long, Long, Double)].collect().head
    assert(r == ((5L, 2L, 1L, 0.5)), s"within-doc repeat not flagged: $r")
  }

  test("chunkDedup shuffles on the chunk key, never all-pairs") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = graft.operators.Catalog.queries("d25_chunk_dedup")
      val p = q(spark, TestSpark.sf0001).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$p")
      assert(p.contains("hashpartitioning(chunk"), s"no chunk-key shuffle:\n$p")
      assert(!p.contains("rangepartitioning"), s"global sort crept in:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("d26 mixture epochs: expansion tracks the weight, plan has no exchange") {
    import spark.implicits._
    val out = graft.operators.Catalog.queries("d26_mixture_epochs")(
      spark, TestSpark.sf001)
    val rows = out.select($"doc_id", $"source", $"epoch")
      .as[(Long, String, Long)].collect()
    // every doc's replicas are epochs 1..n with no gaps
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val es = rs.map(_._3).sorted.toSeq
      assert(es == (1L to es.size), s"doc $id epochs not 1..n: $es")
    }
    // per weight class (srcnum % 4 -> w in {0.5, 1.25, 2.0, 2.75}):
    // replica count / doc count converges to w (hash-fraction sampling)
    val docsPerClass = spark.read
      .parquet(s"${TestSpark.sf001}/documents.parquet")
      .select(regexp_extract($"source", "([0-9]+)$", 1).cast("int") % 4)
      .as[Int].collect().groupBy(identity).view.mapValues(_.size).toMap
    val w = Map(0 -> 0.5, 1 -> 1.25, 2 -> 2.0, 3 -> 2.75)
    rows.groupBy(r => r._2.replaceAll("[^0-9]", "").toInt % 4)
      .foreach { case (c, rs) =>
        val factor = rs.size.toDouble / docsPerClass(c)
        assert(math.abs(factor - w(c)) < 0.25,
          s"class $c expansion $factor, want ~${w(c)}")
      }
    // one projection + one explode: replication happens where the rows
    // live — a shuffle here would move the corpus to copy it
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mixture expansion shuffles:\n$plan")
  }

  test("chunkDedupApply: copies vanish, unique docs reassemble verbatim") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // full copy
      (20L, "iota kappa lambda mu nu xi omicron pi"),
      (30L, "alpha beta gamma delta rho sigma tau upsilon") // half copy
    ).toDF("doc_id", "text")
    val out = graft.text.TextOps.chunkDedupApply(docs, "doc_id", "text", 4)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    // the full copy disappears entirely
    assert(!out.contains(10L), s"full copy survived: ${out.get(10L)}")
    // unique docs reassemble to their exact normalized text
    assert(out(0L)._2 == "alpha beta gamma delta epsilon zeta eta theta")
    assert(out(20L)._2 == "iota kappa lambda mu nu xi omicron pi")
    // the half copy keeps only its unique second chunk
    assert(out(30L) == ((30L, "rho sigma tau upsilon", 1L)), s"${out(30L)}")
    // conservation: kept chunks across the corpus == distinct chunks
    // (doc0's two + doc20's two + doc30's unique second = 5)
    val kept = out.values.map(_._3).sum
    assert(kept == 5, s"kept $kept != distinct chunk count 5")
  }

  test("d28 budget pruning keeps exactly the quality-ranked prefix per shard") {
    import spark.implicits._
    val rows = graft.operators.Catalog.queries("d28_quality_budget")(
      spark, TestSpark.sf001)
      .select($"source", $"shard", $"doc_id", $"n_tokens", $"q",
        $"cum_tokens", $"kept")
      .as[(String, Int, Long, Long, Double, Long, Long)].collect()
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, g) =>
      // independent sequential replay of the budgeted greedy keep
      var cum = 0L
      g.sortBy(r => (-r._5, r._3)).foreach { case (_, _, id, n, _, cumGot, kept) =>
        cum += n
        assert(cumGot == cum, s"doc $id running total $cumGot != $cum")
        assert(kept == (if (cum <= 100L) 1L else 0L), s"doc $id keep decision")
      }
    }
    // the budget actually bites somewhere and spares somewhere
    assert(rows.exists(_._7 == 1L) && rows.exists(_._7 == 0L))
  }
}
