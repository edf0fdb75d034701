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

  /** Σ a_i · b_i, left fold in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  /** Σ (a_i − b_i)², left fold in index order (squared L2 — N5). */
  def sqdist(a: Column, b: Column): Column =
    aggregate(
      transform(zip_with(a, b, (x, y) => x - y), d => d * d),
      lit(0.0), (s, v) => s + v)

  /** Cosine similarity a·b / (|a|·|b|). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

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
    val bits: Seq[Column] =
      planes.toSeq.map(h => when(dotLit(v, h) >= 0.0, 1L).otherwise(0L))
    val codes = bits.grouped(bitsPerBand).toSeq.zipWithIndex.map {
      case (g, band) =>
        g.zipWithIndex.map { case (b, j) => b * lit(1L << j) }
          .reduce(_ + _) + lit(band.toLong << bitsPerBand)
    }
    array(codes: _*)
  }

  /** Scalable top-k per query without a full-partition window sort:
    * phase 1 takes a bounded top-k inside each (qid, hash-bucket) group
    * (hash agg, map-side partial), phase 2 merges ≤ buckets·k rows per
    * qid. Input needs columns (qid, vec_id, score); higher score = better.
    * Output: (qid, rank, vec_id, score) with deterministic vec_id tiebreak.
    */
  def topKPerQuery(scored: DataFrame, k: Int, buckets: Int = 64): DataFrame = {
    val ranked = struct((-col("score")).as("ns"), col("vec_id").as("vid"))
    scored
      .groupBy(col("qid"), pmod(col("vec_id"), lit(buckets)).as("bkt"))
      .agg(slice(array_sort(collect_list(ranked)), 1, k).as("top"))
      .groupBy(col("qid"))
      .agg(slice(array_sort(flatten(collect_list(col("top")))), 1, k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("col.vid").as("vec_id"), (-col("col.ns")).as("score"))
  }
}
