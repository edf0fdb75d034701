package graft.functions

import graft.TestSpark
import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HashExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs() = {
    import spark.implicits._
    spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .filter(size($"toks") >= 3)
  }

  test("native simhash64 expression equals the HOF form on real docs") {
    import spark.implicits._
    // the original higher-order-function rendering, kept here as the
    // independent oracle for the native expression
    val acc = "aggregate(" +
      "transform(toks, t -> xxhash64(t)), " +
      "array_repeat(0, 64), " +
      "(acc, h) -> zip_with(acc, sequence(0, 63), " +
      "(a, b) -> a + CASE WHEN (h & shiftleft(1L, b)) <> 0 THEN 1 ELSE -1 END))"
    val hofSimhash = expr("aggregate(zip_with(" + acc + ", sequence(0, 63), " +
      "(c, b) -> IF(c > 0, shiftleft(1L, b), 0L)), 0L, (s, v) -> s | v)")
    val rows = docs()
      .select($"doc_id",
        hofSimhash.as("hof"),
        GraftFunctions.simhash64($"toks").as("native"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("hof") == r.getAs[Long]("native"),
        s"doc ${r.get(0)}")
    }
  }

  test("native minhash signature equals the HOF form on real docs") {
    import spark.implicits._
    val k = 32
    val rows = docs()
      .withColumn("sh", TextOps.shingles("toks", 3))
      .select($"doc_id",
        expr(s"array(${(0 until k).map(i =>
          s"array_min(transform(sh, t -> xxhash64(t, ${i + 1})))").mkString(", ")})")
          .as("hof"),
        GraftFunctions.minhashSignature($"sh", k).as("native"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("hof") ==
        r.getAs[scala.collection.Seq[Long]]("native"), s"doc ${r.get(0)}")
    }
  }

  test("native normTokens equals the regex normalize+split chain") {
    import spark.implicits._
    val hof = split(lower(trim(regexp_replace($"text", "\\s+", " "))), " ")
    // real docs plus crafted edge cases: empty, all-whitespace, mixed
    // whitespace classes, multi-byte and case-mapped unicode
    val crafted = Seq("", "   ", " \t\n\f\r ", "a", "  a  b ",
      "HÉLLO\tWörld", "日本語 テスト", "Mixed\r\nCASE\ttokens  here",
      "İstanbul Iİ")
      .toDF("text")
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"text")
    for (df <- Seq(crafted, docs)) {
      val rows = df.select(hof.as("hof"),
        GraftFunctions.normTokens($"text").as("native")).collect()
      rows.foreach { r =>
        assert(r.getAs[scala.collection.Seq[String]]("hof") ==
          r.getAs[scala.collection.Seq[String]]("native"),
          s"input: ${r}")
      }
    }
  }

  test("fused shingle-minhash equals the two-step shingles+minhash form") {
    import spark.implicits._
    val k = 16
    val rows = docs()
      .withColumn("sh", TextOps.shingles("toks", 3))
      .select($"doc_id",
        GraftFunctions.minhashSignature($"sh", k).as("twoStep"),
        GraftFunctions.minhashShingles($"toks", 3, k).as("fused"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("twoStep") ==
        r.getAs[scala.collection.Seq[Long]]("fused"), s"doc ${r.get(0)}")
    }
    // multi-byte UTF-8 tokens take the buffer-copy path too
    val uni = Seq(Seq("héllo", "wörld", "日本語", "emoji🙂", "x"))
      .toDF("toks")
      .withColumn("sh", TextOps.shingles("toks", 3))
      .select(GraftFunctions.minhashSignature($"sh", k).as("twoStep"),
        GraftFunctions.minhashShingles($"toks", 3, k).as("fused"))
      .head()
    assert(uni.getAs[scala.collection.Seq[Long]]("twoStep") ==
      uni.getAs[scala.collection.Seq[Long]]("fused"))
  }

  test("native gramHashes equals per-window xxhash64 of the joined gram") {
    import spark.implicits._
    val l = 8
    val rows = docs()
      .filter(size($"toks") >= l)
      .select($"doc_id", $"toks",
        GraftFunctions.gramHashes($"toks", l).as("gh"),
        expr(s"transform(sequence(0, size(toks) - $l), i -> " +
          s"xxhash64(concat_ws(' ', ${(0 until l).map(j => s"toks[i + $j]").mkString(", ")})))")
          .as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("gh") ==
        r.getAs[scala.collection.Seq[Long]]("ref"), s"doc ${r.get(0)}")
    }
    // short input -> null (the reference expr can't even run there:
    // sequence(0, negative) descends — the engine always guards
    // size >= l first, as d71/d82 do)
    val short = Seq(Seq("a", "b")).toDF("toks")
      .select(GraftFunctions.gramHashes($"toks", l).as("gh")).head()
    assert(short.isNullAt(0), "fewer than l tokens must yield null")
    // multi-byte tokens take the buffer-copy path
    val uni = Seq(Seq("héllo", "wörld", "日本語", "x",
        "y", "z", "emoji🙂", "w", "v")).toDF("toks")
      .select(GraftFunctions.gramHashes($"toks", l).as("gh"),
        expr(s"transform(sequence(0, size(toks) - $l), i -> " +
          s"xxhash64(concat_ws(' ', ${(0 until l).map(j => s"toks[i + $j]").mkString(", ")})))")
          .as("ref"))
      .head()
    assert(uni.getAs[scala.collection.Seq[Long]]("gh") ==
      uni.getAs[scala.collection.Seq[Long]]("ref"))
  }

  test("native signLsh equals the HOF band-code form on real embeddings") {
    import spark.implicits._
    import graft.vec.VectorOps
    val planes = VectorOps.hyperplanes(24, dim = 64, seed = 42L)
    val bitsPerBand = 4
    // original HOF rendering as the independent oracle
    val bits: Seq[org.apache.spark.sql.Column] =
      planes.toSeq.map(h => when(VectorOps.dotLit($"v", h) >= 0.0, 1L).otherwise(0L))
    val hofCodes = array(bits.grouped(bitsPerBand).toSeq.zipWithIndex.map {
      case (g, band) =>
        g.zipWithIndex.map { case (b, j) => b * lit(1L << j) }
          .reduce(_ + _) + lit(band.toLong << bitsPerBand)
    }: _*)
    val rows = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(VectorOps.toDouble($"embedding").as("v"))
      .select(hofCodes.as("hof"),
        GraftFunctions.signLsh($"v", planes, bitsPerBand).as("native"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("hof") ==
        r.getAs[scala.collection.Seq[Long]]("native"))
    }
  }

  test("native termCounts equals the per-term HOF filter-count form") {
    import spark.implicits._
    // vocab with hits, misses, and a term that repeats within docs
    val vocab = Seq("the", "data", "zzz-never-present", "of", "a")
    val hof = expr("transform(array('the','data','zzz-never-present','of','a'), " +
      "t -> size(filter(toks, x -> x = t)))")
    val rows = docs()
      .select($"doc_id", hof.as("hof"),
        GraftFunctions.termCounts($"toks", vocab).as("native"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"doc ${r.get(0)}")
    }
    // interpreted path (eval without codegen) agrees too
    val interp = TermCountsExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a", "b", "a", "c"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      Seq("a", "c", "x")).eval(null)
    assert(interp.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq == Seq(2, 1, 0))
  }

  test("native termCounts stays inside WholeStageCodegen") {
    import spark.implicits._
    val plan = docs()
      .select(GraftFunctions.termCounts($"toks", Seq("the", "of")).as("tf"))
      .queryExecution.executedPlan.toString
    val projLine = plan.linesIterator
      .find(_.contains("graft_term_counts")).getOrElse("")
    assert(projLine.trim.matches("""^[+\-:\s]*\*\(\d+\) Project.*"""), plan)
  }

  test("native exprs stay inside WholeStageCodegen") {
    import spark.implicits._
    val plan = docs()
      .select(GraftFunctions.simhash64($"toks").as("s"),
        GraftFunctions.minhashSignature($"toks", 8).as("m"),
        GraftFunctions.gramHashes($"toks", 8).as("g"))
      .queryExecution.executedPlan.toString
    // the * marker on the Project = inside a WholeStageCodegen stage
    val projLine = plan.linesIterator
      .find(_.contains("graft_simhash64")).getOrElse("")
    assert(projLine.trim.matches("""^[+\-:\s]*\*\(\d+\) Project.*"""), plan)
  }

  test("native nearestCentroid equals the HOF argmin form on real embeddings") {
    import spark.implicits._
    import graft.vec.VectorOps
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select($"vec_id", VectorOps.toDouble($"embedding").as("v"))
    val cents = e.orderBy($"vec_id").limit(6).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("v").toArray)
    // original HOF rendering as the independent oracle
    val scored = cents.zipWithIndex.map { case (c, i) =>
      struct(VectorOps.sqdistLit($"v", c).as("dist2"), lit(i).as("cid"))
    }
    val hof = array_min(array(scored.toIndexedSeq: _*))
    val rows = e.select($"vec_id", hof.as("h"),
      GraftFunctions.nearestCentroid($"v", cents).as("n")).collect()
    rows.foreach { r =>
      val h = r.getStruct(1); val n = r.getStruct(2)
      assert(h.getDouble(0) == n.getDouble(0), s"dist2 differs for ${r.get(0)}")
      assert(h.getInt(1) == n.getInt(1), s"cid differs for ${r.get(0)}")
    }
    // tiebreak: two identical centroids -> lower cid wins, both forms
    val tie = Seq(Seq(0.5, 0.5)).toDF("v")
    val tc = Array(Array(1.0, 1.0), Array(1.0, 1.0))
    assert(tie.select(GraftFunctions.nearestCentroid($"v", tc).getField("cid"))
      .as[Int].head() == 0)
  }

  test("GraftExtensions registers SQL-callable functions") {
    import org.apache.spark.sql.SparkSession
    // getOrCreate would return the shared extension-less session; clear
    // it so the builder constructs a fresh one (same SparkContext)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT graft_simhash64(array('a','b')) AS s, " +
          "graft_minhash(array('a','b'), 4) AS m").head()
      assert(r.getAs[Long]("s") != 0L)
      assert(r.getAs[scala.collection.Seq[Long]]("m").size == 4)
    } finally {
      // keep the shared TestSpark session as the active one
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("minKDistinct aggregate equals sorted-distinct-take-k under any partitioning") {
    // the KMV sketch's correctness contract: k smallest DISTINCT
    // values, ascending — duplicates (here forced by the % 997
    // collision domain, scattered across partitions so the MERGE path
    // dedups too, not just update) must not occupy sketch slots
    import spark.implicits._
    val xs = (0 until 5000).map(i =>
      ((i % 7).toString, (i * 2654435761L) % 997))
    val df = xs.toDF("g", "v")
    val want = xs.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(16).toList }
    for (parts <- Seq(1, 3, 17)) {
      val got = df.repartition(parts)
        .groupBy($"g")
        .agg(graft.functions.GraftFunctions.minKDistinct($"v", 16).as("hs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList)
        .toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("MinKDistinctBuffer dedups on insert, bounds at k, merges idempotently") {
    val b = new graft.functions.MinKDistinctBuffer(4)
    Seq(5L, 3L, 5L, 9L, 1L, 3L, 7L, 2L).foreach(b.insert)
    assert(b.v.take(b.size).toList == List(1L, 2L, 3L, 5L))
    val c = new graft.functions.MinKDistinctBuffer(4)
    Seq(2L, 0L, 5L).foreach(c.insert)
    b.merge(c)
    assert(b.v.take(b.size).toList == List(0L, 1L, 2L, 3L))
    // idempotent: merging an identical sketch is a no-op
    val d = new graft.functions.MinKDistinctBuffer(4)
    Seq(0L, 1L, 2L, 3L).foreach(d.insert)
    b.merge(d)
    assert(b.v.take(b.size).toList == List(0L, 1L, 2L, 3L))
  }

  test("empty and null-element arrays are handled") {
    import spark.implicits._
    val df = Seq(Seq.empty[String], Seq("a", "b")).toDF("toks")
    val out = df.select(GraftFunctions.simhash64($"toks").as("s"),
      GraftFunctions.minhashSignature($"toks", 4).as("m"),
      GraftFunctions.minhashShingles($"toks", 3, 4).as("msh")).collect()
    assert(out(0).getAs[Long]("s") == 0L)
    // no shingles -> null signature (matches array_min-of-empty = null;
    // a MaxValue sentinel would LSH-match all short docs to each other)
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(1).getAs[scala.collection.Seq[Long]]("m").size == 4)
    assert(out(1).isNullAt(2)) // 2 tokens < n=3 shingle width
  }

  test("md5_prefix equals the conv(substring(md5)) chain at every used width") {
    import spark.implicits._
    // the interpreted chain every sketch coin used before r19, kept as
    // the independent oracle; widths are exactly the ones the engine
    // uses (bloom positions 4, bucket hashes 6, KMV 10, HLL 12, plus
    // the 1/2/15 edges). Inputs cover ASCII, multibyte UTF-8, the
    // empty string, and a long doc body.
    val inputs = Seq("", "a", "hello world", "héllo wörld 世界",
      "x" * 10000, "0", " ", "\n\t")
    val df = inputs.toDF("s").withColumn("b", $"s".cast("binary"))
    for (k <- Seq(1, 2, 4, 6, 10, 12, 15)) {
      val rows = df.select(
          expr(s"cast(conv(substring(md5(b), 1, $k), 16, 10) as bigint)")
            .as("chain"),
          GraftFunctions.md5Prefix($"b", k).as("native"),
          expr(s"graft_md5_prefix(b, $k)").as("sqlform"))
        .collect()
      rows.foreach { r =>
        assert(r.getAs[Long]("chain") == r.getAs[Long]("native"),
          s"k=$k native mismatch")
        assert(r.getAs[Long]("chain") == r.getAs[Long]("sqlform"),
          s"k=$k sql-registered mismatch")
      }
    }
    // null propagates like the chain's
    val n = Seq[Option[String]](None).toDF("s")
      .select(GraftFunctions.md5Prefix($"s".cast("binary"), 6).as("v"))
      .collect()
    assert(n(0).isNullAt(0))
  }

  test("md5_sort_key limbs equal the conv(substring(md5)) chain and order like the hex string") {
    import spark.implicits._
    val inputs = (1 to 500).map(i => s"doc-$i:ep1") ++
      Seq("", "a", "héllo wörld 世界", "x" * 2000)
    val df = inputs.toDF("s").withColumn("b", $"s".cast("binary"))
    // limb equivalence against the interpreted hex chain (the
    // independent oracle the md5_prefix spec above uses), including
    // the [30,32) tail limb no prefix kernel can reach
    val rows = df.select(
        expr("cast(conv(substring(md5(b), 1, 15), 16, 10) as bigint)").as("c0"),
        expr("cast(conv(substring(md5(b), 16, 15), 16, 10) as bigint)").as("c1"),
        expr("cast(conv(substring(md5(b), 31, 2), 16, 10) as bigint)").as("c2"),
        GraftFunctions.md5SortKey($"b").as("native"),
        expr("graft_md5_sort_key(b)").as("sqlform"),
        md5($"b").as("hex"))
      .collect()
    rows.foreach { r =>
      val nat = r.getAs[scala.collection.Seq[Long]]("native")
      val sql = r.getAs[scala.collection.Seq[Long]]("sqlform")
      val chain = Seq(r.getAs[Long]("c0"), r.getAs[Long]("c1"), r.getAs[Long]("c2"))
      assert(nat == chain, s"native limbs $nat != chain $chain")
      assert(sql == chain, s"sql-registered limbs $sql != chain $chain")
    }
    // ORDER equivalence — the property d24 rides on: sorting by the
    // key array must reproduce sorting by the hex string exactly
    val byHex = rows.sortBy(_.getAs[String]("hex")).map(_.getAs[String]("hex"))
    implicit val seqOrd: Ordering[scala.collection.Seq[Long]] =
      Ordering.Implicits.seqOrdering(Ordering.Long)
    val byKey = rows.sortBy(_.getAs[scala.collection.Seq[Long]]("native"))
      .map(_.getAs[String]("hex"))
    assert(byKey.toSeq == byHex.toSeq,
      "array order diverged from hex lexicographic order")
    // null propagates
    val n = Seq[Option[String]](None).toDF("s")
      .select(GraftFunctions.md5SortKey($"s".cast("binary")).as("v"))
      .collect()
    assert(n(0).isNullAt(0))
  }
}
