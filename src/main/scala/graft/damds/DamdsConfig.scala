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
  * IsSimpleWeights (per-point w_i·w_j) and IsSammon (w/max(d,
  * 0.001·avgDist)) are fully supported; DistanceTransform != 1, which
  * would silently change every distance, is rejected with an error
  * instead of being dropped.
  */
object DamdsConfig {

  final case class Job(
      distanceMatrixFile: String,
      weightMatrixFile: Option[String],
      simpleWeightsFile: Option[String],
      initialPointsFile: Option[String],
      numberDataPoints: Int,
      bigEndian: Boolean,
      splits: Int,
      cfg: Damds.Config)

  /** Seed embedding: InitialPointsFile when configured (whitespace
    * text, n rows × targetDim, the reference's init.txt format), else
    * a seeded uniform random in [-0.5, 0.5).
    */
  def initialX(job: Job, seed: Long = 17L): Array[Double] =
    job.initialPointsFile match {
      case Some(f) =>
        val vals = scala.io.Source.fromFile(f).mkString.trim
          .split("\\s+").map(_.toDouble)
        require(vals.length == job.numberDataPoints * job.cfg.targetDim,
          s"init file $f has ${vals.length} values, want " +
            s"${job.numberDataPoints} x ${job.cfg.targetDim}")
        vals
      case None =>
        val rnd = new java.util.Random(seed)
        Array.fill(job.numberDataPoints * job.cfg.targetDim)(
          rnd.nextDouble() - 0.5)
    }

  def fromProperties(path: String, splits: Int = 32): Job = {
    val p = new Properties()
    val in = new FileInputStream(path)
    try p.load(in) finally in.close()
    def get(name: String, default: String): String =
      Option(System.getProperty(name))
        .orElse(Option(p.getProperty(name))).getOrElse(default)
    val simpleWeights = get("IsSimpleWeights", "false").toBoolean
    // a key that would silently change every distance is REJECTED
    // rather than ignored
    require(get("DistanceTransform", "1.0").toDouble == 1.0,
      "DistanceTransform != 1.0 is not supported")
    // an absent file whose name equals the key's DEFAULT degrades to
    // the reference's null-fallback (constant weight 1.0 / random init)
    // — whether the default was implied or spelled out in the config —
    // but any OTHER configured path that does not exist fails fast: the
    // reference errors when it cannot read a named file, and a typo'd
    // path must not silently change numeric results
    def optionalFile(key: String, default: String): Option[String] = {
      val explicit = Option(System.getProperty(key))
        .orElse(Option(p.getProperty(key)))
      val f = explicit.getOrElse(default)
      if (f.isEmpty) None
      else if (java.nio.file.Files.exists(java.nio.file.Paths.get(f))) Some(f)
      else {
        require(explicit.isEmpty || explicit.contains(default),
          s"$key=$f is explicitly configured but does not exist")
        None
      }
    }
    val existing = optionalFile("WeightMatrixFile", "weights.bin")
    Job(
      distanceMatrixFile = get("DistanceMatrixFile", "distance.bin"),
      // per-cell short weight matrix is the reference's default
      // (non-simple) mode; IsSimpleWeights=true reads the same file key
      // as N per-point doubles (w_i·w_j, RowBlock.java:98-99,127-129);
      // a missing file means constant weight 1.0 (WeightsWrap(null)
      // mode, io/RowBlock.java:101-103)
      weightMatrixFile = if (simpleWeights) None else existing,
      simpleWeightsFile = if (simpleWeights) existing else None,
      initialPointsFile = optionalFile("InitialPointsFile", "init.txt"),
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
        maxTempLoops = get("MaxTempLoops", "0").toInt,
        // reference Sammon default factor 0.001 (RowBlock.java:107-108)
        sammonFactor =
          if (get("IsSammon", "false").toBoolean) 0.001 else 0.0))
  }

  /** Load inputs per the job spec and run the full pipeline. */
  def run(spark: SparkSession, job: Job, initX: Array[Double])
      : Damds.RunResult = {
    require(job.numberDataPoints > 0, "NumberDataPoints must be set")
    val blocks = DamdsIO.loadSideRead(spark, job.distanceMatrixFile,
      job.weightMatrixFile, job.numberDataPoints, job.splits, job.bigEndian,
      simpleWeightsFile = job.simpleWeightsFile)
    Damds.run(spark, blocks, initX, job.numberDataPoints, job.cfg)
  }
}
