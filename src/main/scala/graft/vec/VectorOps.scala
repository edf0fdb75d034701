package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector primitives over `array<double>` columns for similarity search
  * and K-Means (reference kernels N5/N6, kmeans/Point2.java:26-32,
  * damds/DAMDSUtils.java:11-26) plus random-hyperplane LSH for ANN.
  *
  * Everything is codegen'd higher-order-function Columns — no UDFs. The
  * fold order of every reduction is fixed (index order, left fold with
  * 0.0 init) so results are bit-identical to DuckDB's `list_reduce` over
  * the same data, which is what makes these oracle-checkable.
  */
object VectorOps {

  /** Cast a float-array column to double elementwise (done once, up
    * front, so all arithmetic below is pure double). */
  def toDouble(a: Column): Column = a.cast("array<double>")

  /** Σ a_i · b_i, left fold in index order. Native codegen'd kernel
    * (graft.functions.DotExpr) — bit-identical to the HOF form
    * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` (pinned in
    * VecExprsSpec), which allocated a zipped array per row and ran
    * interpreted outside WholeStageCodegen on every ANN/dedup scoring
    * path. */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot(a, b)

  /** The pre-native HOF rendering of `dot` — kept as the independent
    * in-engine oracle the native kernel is spec'd against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  /** Σ (a_i − b_i)², left fold in index order (squared L2 — N5). */
  def sqdist(a: Column, b: Column): Column =
    aggregate(
      transform(zip_with(a, b, (x, y) => x - y), d => d * d),
      lit(0.0), (s, v) => s + v)

  /** Cosine similarity a·b / (|a|·|b|). Native fused kernel
    * (graft.functions.CosineExpr): one codegen'd pass computes the
    * three index-order dots, then the same sqrt/divide tail — bit-
    * identical to `dotHof`-composed cosine (VecExprsSpec) and to the
    * DuckDB oracle rendering. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine(a, b)

  /** HOF-composed cosine — the independent in-engine oracle for the
    * fused kernel. */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Σ a_i · h_i against a driver-side constant hyperplane. */
  def dotLit(a: Column, h: Array[Double]): Column =
    dot(a, typedLit(h.toSeq))

  /** Squared L2 against a driver-side constant vector. */
  def sqdistLit(a: Column, c: Array[Double]): Column =
    sqdist(a, typedLit(c.toSeq))

  // ---- DuckDB oracle-side renderings of the same folds ----

  /** DuckDB SQL for `dot` with identical fold order/precision. */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (s, v) -> s + v)"

  /** DuckDB SQL for `sqdist` with identical fold order/precision. */
  def sqdistSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)), d -> d * d), " +
      "(s, v) -> s + v)"

  /** DuckDB SQL for `cosine`. */
  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** `dotSql` over the first `n` components only (the matryoshka
    * truncation fold — identical index order/precision to a Spark
    * fold over `slice(a, 1, n)`). */
  def dotSqlN(a: String, b: String, n: Int): String =
    s"list_reduce(list_transform(generate_series(1, $n), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (s, v) -> s + v)"

  /** DuckDB SQL for cosine over the first `n` components. */
  def cosineSqlN(a: String, b: String, n: Int): String =
    s"(${dotSqlN(a, b, n)} / (sqrt(${dotSqlN(a, a, n)}) * sqrt(${dotSqlN(b, b, n)})))"

  // ---- random-hyperplane LSH (sign of projection; SRP/Charikar) ----

  /** Deterministic Gaussian hyperplanes: `planes` rows × `dim` cols. */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Per-band LSH codes: sign bit per hyperplane, packed `bitsPerBand`
    * bits per band. Returns an array<long> column, one code per band.
    * One projection, zero shuffle — the only shuffle an ANN query needs
    * is the subsequent join on (band, code).
    */
  def bandCodes(v: Column, planes: Array[Array[Double]], bitsPerBand: Int): Column = {
    require(planes.length % bitsPerBand == 0,
      s"planes=${planes.length} not divisible by bitsPerBand=$bitsPerBand")
    // native one-pass expression: the HOF form built |planes| separate
    // fold expressions (an array allocation each) per row
    graft.functions.GraftFunctions.signLsh(v, planes, bitsPerBand)
  }

  /** Embedding-cosine near-duplicate pairs via sign-LSH blocking — the
    * 100 TB-shaped plan:
    *
    *  1. one projection computes all band codes (zero shuffle);
    *  2. the band self-join ships (id, band, code) rows ONLY — never
    *     vectors — so a pair colliding in b bands costs b tiny rows,
    *     and `dropDuplicates(id_a, id_b)` runs on 16-byte pairs;
    *  3. vectors are fetched once per surviving pair via two joins
    *     against the input (hash joins on the id — broadcast if the
    *     vector side is small, shuffle otherwise);
    *  4. exact cosine filter at `tau` — precision 1 by construction.
    *
    * Candidate volume is governed by `bitsPerBand`: a uniform random
    * pair collides in a band with ~2^-bits, so bits should grow with
    * log2(n) to keep candidates near-linear. Recall for true near-dups
    * (cos ≥ 0.9 ⇒ per-plane agreement ≈ 0.86) with 8-bit bands is
    * 1-(1-0.86^8)^bands — ≥0.98 for 12 bands.
    *
    * Input df needs (idCol, v: array<double>). Output:
    * (id_a, id_b, cosine), id_a < id_b.
    */
  def lshDupPairs(df: DataFrame, idCol: String, planes: Array[Array[Double]],
      bitsPerBand: Int, tau: Double): DataFrame = {
    val banded = df
      .select(col(idCol).as("id"),
        posexplode(bandCodes(col("v"), planes, bitsPerBand))
          .as(Seq("band", "code")))
    val a = banded.select(col("id").as("id_a"), col("band"), col("code"))
    val b = banded.select(col("id").as("id_b"), col("band"), col("code"))
    val pairs = a.join(b, Seq("band", "code"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val va = df.select(col(idCol).as("id_a"), col("v").as("va"))
    val vb = df.select(col(idCol).as("id_b"), col("v").as("vb"))
    pairs.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Scalable top-k per query without a full-partition window sort and
    * without buffering any group: one `groupBy(qid)` over a bounded-heap
    * `TypedImperativeAggregate` (graft.functions.BoundedTopKAgg). Spark
    * plans it as ObjectHashAggregate with map-side partials, so each map
    * task keeps a k-element heap per qid, the shuffle carries ≤ tasks·k
    * pairs per qid, and the reduce side heap-merges — O(k) memory per
    * group at any corpus size. Input needs columns (qid, vec_id: bigint,
    * score); higher score = better. Output: (qid, rank, vec_id, score)
    * with deterministic vec_id tiebreak, value-identical to
    * `slice(array_sort(collect_list(struct(-score, vec_id))), 1, k)`.
    */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    scored
      .groupBy(col("qid"))
      .agg(graft.functions.GraftFunctions
        .boundedTopK((-col("score")).cast("double"), col("vec_id").cast("long"), k)
        .as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("col.vid").as("vec_id"), (-col("col.ns")).as("score"))
  }
}
