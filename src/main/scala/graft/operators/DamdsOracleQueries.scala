package graft.operators

import graft.Tables
import graft.damds.DamdsKernels
import graft.damds.DamdsKernels.DamdsBlock
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** DuckDB-oracle rows for the DA-MDS numeric kernels that were
  * previously spec-only: stress σ (N4/A7, damds/Stress.java:55-93),
  * B(Z)·X (N3, damds/BC.java:86-134) and V·x with the VArray diagonal
  * (N2+A8, damds/VArray.java:49-67 + the CG multiply contract at
  * damds/CG.java:411-421).
  *
  * The ACTUAL block kernels run on Spark (one `DamdsBlock` per row so
  * each block partial is a checkable output row); the oracle recomputes
  * the same arithmetic in plain SQL over a deterministic fixed-point
  * matrix derived from the `embeddings` fixture's id universe:
  *   δ_ij = ((31i + 17j) mod 32768) / 32767   (fixed-point short decode)
  *   w_ij = ((13i +  7j) mod 32768) / 32767
  *   x_i  = (i mod 8, i div 8)                 (2-d target embedding)
  * tCur = 0 so the annealing diff term is 0 (heatDiff cutoff).
  *
  * Determinism: per-row double sums over 64 terms differ between the
  * kernel's sequential fold and DuckDB's aggregate order only in the
  * last bits; both sides round to 6 decimals (the Catalog contract for
  * order-dependent folds).
  */
object DamdsOracleQueries {

  private val n = 64
  private val dim = 2

  private def distRow(i: Int): Array[Short] =
    Array.tabulate(n)(j => ((i * 31 + j * 17) % 32768).toShort)
  private def weightRow(i: Int): Array[Short] =
    Array.tabulate(n)(j => ((i * 13 + j * 7) % 32768).toShort)
  private def xFlat: Array[Double] =
    Array.tabulate(n * dim) { k =>
      val i = k / dim
      if (k % dim == 0) (i % 8).toDouble else (i / 8).toDouble
    }

  /** One single-row block per fixture id (vec_id < n), so every block
    * partial the kernel emits is one oracle-checkable output row. */
  private def blocks(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[DamdsBlock] = {
    val ids = Tables(s, dir, "embeddings")
      .select(col("vec_id")).filter(col("vec_id") < n)
      .collect().map(_.getLong(0)).sorted
    require(ids.length == n, s"fixture has ${ids.length} < $n ids")
    s.createDataset(ids.map { id =>
      val i = id.toInt
      DamdsBlock(i, i, 1, n, distRow(i), weightRow(i))
    }.toIndexedSeq)(Encoders.product[DamdsBlock])
  }

  /** Shared oracle prelude: the id universe with its 2-d embedding and
    * the (i, j, δ, w, euclidean) cell view. */
  private def matSql(body: String): String =
    s"""WITH ids AS (SELECT vec_id AS i, CAST(vec_id % 8 AS DOUBLE) AS px,
       |               CAST(vec_id // 8 AS DOUBLE) AS py
       |             FROM embeddings WHERE vec_id < $n),
       |  cells AS (SELECT a.i AS i, a.px AS apx, a.py AS apy,
       |              b.i AS j, b.px AS bpx, b.py AS bpy,
       |              ((a.i * 31 + b.i * 17) % 32768) * (1.0 / 32767) AS delta,
       |              ((a.i * 13 + b.i * 7) % 32768) * (1.0 / 32767) AS w,
       |              CASE WHEN a.i <> b.i THEN
       |                sqrt((a.px - b.px) * (a.px - b.px)
       |                   + (a.py - b.py) * (a.py - b.py))
       |              ELSE 0.0 END AS euc
       |            FROM ids a CROSS JOIN ids b)
       |$body""".stripMargin

  // ---- n03: stress σ per-row partials (N4/A7) ----
  private def n03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val xB = s.sparkContext.broadcast(xFlat)
    blocks(s, dir)
      .map(b => (b.start.toLong, DamdsKernels.stressSigma(b, xB.value, dim, 0.0)))
      .toDF("row_id", "sigma")
      .select($"row_id", round($"sigma", 6).as("sigma"))
  }
  private val n03Sql = matSql(
    """SELECT i AS row_id,
      |  round(SUM(w * (delta - euc) * (delta - euc)), 6) AS sigma
      |FROM cells GROUP BY i""".stripMargin)

  // ---- n04: B(Z)·X per-row (N3) ----
  private def n04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val xB = s.sparkContext.broadcast(xFlat)
    blocks(s, dir)
      .map { b =>
        val out = DamdsKernels.bcBlock(b, xB.value, dim, 0.0)
        (b.start.toLong, out(0), out(1))
      }
      .toDF("row_id", "bx", "by")
      .select($"row_id", round($"bx", 6).as("bx"), round($"by", 6).as("by"))
  }
  // B_ij = −w δ / d(X) when d ≥ 1e-10 ∧ δ > diff(=0); B_ii = −Σ_{j≠i} B_ij
  private val n04Sql = matSql(
    """SELECT i AS row_id,
      |  round(SUM(bij * bpx) + (-SUM(bij)) * apx, 6) AS bx,
      |  round(SUM(bij * bpy) + (-SUM(bij)) * apy, 6) AS by
      |FROM (SELECT *, CASE WHEN euc >= 1e-10 AND delta > 0
      |        THEN -w * delta / euc ELSE 0.0 END AS bij
      |      FROM cells WHERE i <> j AND w <> 0) t
      |GROUP BY i, apx, apy""".stripMargin)

  // ---- n05: V·x with VArray diagonal (N2 + A8) ----
  private def n05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val xB = s.sparkContext.broadcast(xFlat)
    blocks(s, dir)
      .map { b =>
        val v = DamdsKernels.vArray(b)
        val out = DamdsKernels.mmBlock(DamdsKernels.weightView(b), v, xB.value, dim)
        (b.start.toLong, v(0), out(0), out(1))
      }
      .toDF("row_id", "v", "ox", "oy")
      .select($"row_id", round($"v", 6).as("v"),
        round($"ox", 6).as("ox"), round($"oy", 6).as("oy"))
  }
  // v_i = 1 + Σ_{j≠i, w≠0} w_ij ; out = v_i·x_i − Σ_{j≠i, w≠0} w_ij·x_j
  private val n05Sql = matSql(
    """SELECT i AS row_id, round(v, 6) AS v,
      |  round(v * apx - sx, 6) AS ox, round(v * apy - sy, 6) AS oy
      |FROM (SELECT i, apx, apy,
      |        1 + SUM(CASE WHEN w <> 0 THEN w ELSE 0.0 END) AS v,
      |        SUM(CASE WHEN w <> 0 THEN w * bpx ELSE 0.0 END) AS sx,
      |        SUM(CASE WHEN w <> 0 THEN w * bpy ELSE 0.0 END) AS sy
      |      FROM cells WHERE i <> j GROUP BY i, apx, apy) t""".stripMargin)

  // ---- n08: Sammon + simple-weight row sums (N11) ----
  // Exercises DamdsBlock.w's two non-trivial weight modes per cell:
  // the fixed-point matrix weight and the per-point simple weights
  // (rw_i·rw_j), both under Sammon damping w / max(δ, factor·avgDist).
  // avgDist is injected as the CONSTANT 0.5 (in production it comes
  // from the A6 DoubleStatistics pass; a recomputed average would
  // differ between engines in the last FP bits and could flip the
  // max() branch at the threshold) so the δ > 0.25 branch choice is
  // bit-deterministic on both sides. factor·avg = 0.25 splits the
  // uniform-ish δ ∈ [0,1) matrix roughly 1:3 across the two branches.
  private def n08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    blocks(s, dir)
      .map { b0 =>
        val b = b0.copy(sammonFactor = 0.5, avgDist = 0.5)
        val br = b.copy(rowWeight =
          Array.tabulate(b.n)(i => 1.0 + (i % 4) * 0.25))
        var sw = 0.0; var srw = 0.0
        var j = 0
        while (j < b.n) { sw += b.w(0, j); srw += br.w(0, j); j += 1 }
        (b.start.toLong, sw, srw)
      }
      .toDF("row_id", "sw", "srw")
      .select($"row_id", round($"sw", 6).as("sw"),
        round($"srw", 6).as("srw"))
  }
  private val n08Sql = matSql(
    """SELECT i AS row_id,
      |  round(SUM(w / GREATEST(delta, 0.25)), 6) AS sw,
      |  round(SUM((1 + (i % 4) * 0.25) * (1 + (j % 4) * 0.25)
      |            / GREATEST(delta, 0.25)), 6) AS srw
      |FROM cells GROUP BY i""".stripMargin)

  // ---- n09: annealing temperature schedule (N9) ----
  // The exact schedule Damds.run walks: t0 = α·(vmax/√(2d)), then
  // Damds.cooledTemp (geometric decay, snap to 0 below tMin) until 0.
  // The oracle is a RECURSIVE CTE doing the same iterated multiply —
  // bit-identical, because α^k via repeated multiplication is NOT the
  // same double as power(α, k), and both engines here run the
  // identical FP op sequence (no rounding needed). vmax/positiveMin
  // come from the same δ fixture expression on both sides (max/min
  // are exact, sqrt and the arithmetic are IEEE-identical).
  private def n09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    var vmax = Double.MinValue; var pmin = Double.MaxValue
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        val dlt = ((i * 31 + j * 17) % 32768) * (1.0 / 32767)
        if (dlt > vmax) vmax = dlt
        if (dlt > 0 && dlt < pmin) pmin = dlt
        j += 1
      }
      i += 1
    }
    val alpha = 0.95
    val tMax = vmax / math.sqrt(2.0 * dim)
    val tMin = 0.01 * pmin / math.sqrt(2.0 * dim)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    var t = alpha * tMax; var itr = 0L
    out += ((itr, t))
    while (t > 0) {
      t = graft.damds.Damds.cooledTemp(t, tMin, alpha)
      itr += 1
      out += ((itr, t))
    }
    out.toSeq.toDF("itr", "temp")
  }
  private val n09Sql =
    s"""WITH RECURSIVE
       |idx AS (SELECT a.vec_id AS i, b.vec_id AS j
       |        FROM embeddings a CROSS JOIN embeddings b
       |        WHERE a.vec_id < $n AND b.vec_id < $n),
       |cells AS (SELECT ((i * 31 + j * 17) % 32768) * (1.0 / 32767) AS delta
       |          FROM idx),
       |s AS (SELECT MAX(delta) AS vmax,
       |        MIN(CASE WHEN delta > 0 THEN delta END) AS pmin FROM cells),
       |t AS (
       |  SELECT CAST(0 AS BIGINT) AS itr,
       |    0.95 * (vmax / sqrt(2.0 * $dim)) AS temp,
       |    0.01 * pmin / sqrt(2.0 * $dim) AS tmin
       |  FROM s
       |  UNION ALL
       |  SELECT itr + 1,
       |    CASE WHEN temp * 0.95 < tmin THEN 0.0 ELSE temp * 0.95 END,
       |    tmin
       |  FROM t WHERE temp > 0)
       |SELECT itr, temp FROM t""".stripMargin

  val all: Seq[Q] = Seq(
    Q("n03_stress_sigma", n03, Some(n03Sql)),
    Q("n04_bofz_multiply", n04, Some(n04Sql)),
    Q("n05_vx_multiply", n05, Some(n05Sql)),
    Q("n08_sammon_weights", n08, Some(n08Sql)),
    Q("n09_temperature_schedule", n09, Some(n09Sql)))
}
