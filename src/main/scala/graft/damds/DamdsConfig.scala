package graft.damds

import java.io.FileInputStream
import java.util.Properties

import org.apache.spark.sql.SparkSession

/** Reference-compatible configuration: parses the same
  * `config.properties` keys the reference's DAMDSSection reads
  * (damds/configuration/section/DAMDSSection.java:10-56, same names and
  * defaults), so a flink-mm user can point their existing config file
  * at this engine. Keys about Flink-specific plumbing (memory mapping,
  * timing/summary files, transformation functions) are accepted and
  * ignored — loop state lives on the driver here, not in files. Keys
  * that would silently change numeric results (IsSimpleWeights,
  * IsSammon, DistanceTransform != 1) are rejected with an error
  * instead of being dropped.
  */
object DamdsConfig {

  final case class Job(
      distanceMatrixFile: String,
      weightMatrixFile: Option[String],
      numberDataPoints: Int,
      bigEndian: Boolean,
      splits: Int,
      cfg: Damds.Config)

  def fromProperties(path: String, splits: Int = 32): Job = {
    val p = new Properties()
    val in = new FileInputStream(path)
    try p.load(in) finally in.close()
    def get(name: String, default: String): String =
      Option(System.getProperty(name))
        .orElse(Option(p.getProperty(name))).getOrElse(default)
    val weightFile = get("WeightMatrixFile", "weights.bin")
    val simpleWeights = get("IsSimpleWeights", "false").toBoolean
    // modes that silently change numeric results are REJECTED rather
    // than ignored: per-point simple-weight files (IsSimpleWeights) and
    // Sammon weighting are not wired into the block loader yet, and a
    // non-identity DistanceTransform changes every distance
    require(!simpleWeights,
      "IsSimpleWeights=true (per-point weight file) is not supported; " +
        "provide a per-cell WeightMatrixFile or constant weights")
    require(!get("IsSammon", "false").toBoolean,
      "IsSammon=true is not supported in the config path " +
        "(DamdsKernels.sammonWeight exists for callers wiring it explicitly)")
    require(get("DistanceTransform", "1.0").toDouble == 1.0,
      "DistanceTransform != 1.0 is not supported")
    Job(
      distanceMatrixFile = get("DistanceMatrixFile", "distance.bin"),
      // per-cell short weight matrix is the reference's default
      // (non-simple) mode; a missing file means constant weight 1.0
      // (the reference's WeightsWrap(null) mode, io/RowBlock.java:101-103)
      weightMatrixFile = Some(weightFile).filter(f =>
        f.nonEmpty && java.nio.file.Files.exists(java.nio.file.Paths.get(f))),
      numberDataPoints = get("NumberDataPoints", "-1").toInt,
      bigEndian = get("IsBigEndian", "false").toBoolean,
      splits = splits,
      cfg = Damds.Config(
        targetDim = get("TargetDimension", "3").toInt,
        alpha = get("Alpha", "0.95").toDouble,
        tMinFactor = get("TminFactor", "0.5").toDouble,
        threshold = get("Threshold", "0.000001").toDouble,
        cgIter = get("CGIterations", "20").toInt,
        cgThreshold = get("CGErrorThreshold", "1").toDouble,
        exactCG = get("ExactCGIter", "false").toBoolean,
        maxStressLoops = get("MaxStressLoops", "0").toInt,
        maxTempLoops = get("MaxTempLoops", "0").toInt))
  }

  /** Load inputs per the job spec and run the full pipeline. */
  def run(spark: SparkSession, job: Job, initX: Array[Double])
      : Damds.RunResult = {
    require(job.numberDataPoints > 0, "NumberDataPoints must be set")
    val blocks = DamdsIO.loadSideRead(spark, job.distanceMatrixFile,
      job.weightMatrixFile, job.numberDataPoints, job.splits, job.bigEndian)
    Damds.run(spark, blocks, initX, job.numberDataPoints, job.cfg)
  }
}
