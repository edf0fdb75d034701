package graft.operators

import graft.Tables
import graft.damds.Damds
import graft.damds.DamdsKernels.DamdsBlock
import graft.mm.FixedPoint
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** The full DA-MDS pipeline as a registered query (reference
  * composition §3.1: damds/DAMDS.java:154-253 — stats → floor repair →
  * V array → annealed SMACOF with CG inner solves). Input is a
  * deterministic N×N fixed-point distance matrix derived from the
  * `embeddings` fixture; output is the per-axis summary of the final
  * low-dimensional embedding plus the run's stress trace.
  *
  * The annealing loop is not one SQL statement, but the run is fully
  * deterministic (verified bit-identical across executor counts), so
  * the driver row is gated by a pinned golden table
  * (GoldenOracles.n02); numeric behavior is independently
  * oracle-tested in DamdsSpec (kernels vs dense algebra, CG vs direct
  * solve, stress monotonicity).
  */
object DamdsQueries {

  private val n = 128
  private val targetDim = 3

  /** Distance matrix: normalized pairwise L2 over the n lowest-id
    * embedding vectors, fixed-point encoded — fully determined by the
    * fixture bytes.
    */
  private def distanceBlocks(s: SparkSession, dir: String, splits: Int)
      : org.apache.spark.sql.Dataset[DamdsBlock] = {
    import s.implicits._
    // this builder collects N vectors and materializes the N×N matrix
    // on the driver — fixture-only by design (the reference's DAMDS
    // reads a pre-computed distance file; the parallelism-1 gather is
    // its contract). For larger N build blocks distributedly: assign
    // row ranges, broadcast the N×d vectors, compute each block's rows
    // in its own task (the mm/Gemm block pattern).
    require(n <= 1024, s"driver-side N×N distance build capped at 1024 (n=$n)")
    val vecs = Tables(s, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .filter($"vec_id" < n)
      .orderBy($"vec_id")
      .as[(Long, Seq[Double])].collect().map(_._2.toArray)
    require(vecs.length == n, s"fixture has ${vecs.length} < $n vectors")
    val dim = vecs.head.length
    val dist = new Array[Double](n * n)
    var mx = 0.0
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        var s2 = 0.0
        var k = 0
        while (k < dim) {
          val t = vecs(i)(k) - vecs(j)(k); s2 += t * t; k += 1
        }
        val d = math.sqrt(s2)
        dist(i * n + j) = d
        if (d > mx) mx = d
        j += 1
      }
      i += 1
    }
    val shorts = dist.map(d => FixedPoint.encode(d / mx))
    val blocks = graft.mm.MatrixIO.rowSplits(n, splits).zipWithIndex.map {
      case ((start, rows), idx) =>
        DamdsBlock(idx, start, rows, n,
          java.util.Arrays.copyOfRange(shorts, start * n, (start + rows) * n),
          Array.empty[Short])
    }
    s.createDataset(blocks)(Encoders.product[DamdsBlock])
  }

  /** Deterministic seed embedding in [-0.5, 0.5). */
  private def initX: Array[Double] = {
    val rnd = new java.util.Random(17L)
    Array.fill(n * targetDim)(rnd.nextDouble() - 0.5)
  }

  private def n02(s: SparkSession, dir: String): DataFrame = {
    val blocks = distanceBlocks(s, dir, splits = 8)
    val res = Damds.run(s, blocks, initX, n,
      Damds.Config(targetDim = targetDim, cgIter = 10,
        maxStressLoops = 1, maxTempLoops = 2))
    val x = res.x
    val rows = (0 until targetDim).map { d =>
      val axis = (0 until n).map(i => x(i * targetDim + d))
      val mean = axis.sum / n
      val variance = axis.map(v => (v - mean) * (v - mean)).sum / n
      (d.toLong, math.rint(mean * 1e6) / 1e6,
        math.rint(math.sqrt(variance) * 1e6) / 1e6)
    } :+ ((-1L, math.rint(res.state.stress * 1e6) / 1e6,
      res.state.cgCount.toDouble))
    s.createDataFrame(rows).toDF("axis", "mean_or_stress", "std_or_cg")
  }

  val all: Seq[Q] = Seq(
    Q("n02_damds_embed", n02, Some(GoldenOracles.n02)))
}
