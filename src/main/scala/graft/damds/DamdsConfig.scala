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
  * ignored — loop state lives on the driver here, not in files.
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
    Job(
      distanceMatrixFile = get("DistanceMatrixFile", "distance.bin"),
      // the reference treats a missing/blank weight file as constant
      // weight 1.0 (io/RowBlock.java:101-103)
      weightMatrixFile =
        if (weightFile.isEmpty || !simpleWeights) None else Some(weightFile),
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
