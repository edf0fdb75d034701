package graft.damds

import java.nio.file.{Files, Paths}

import graft.TestSpark
import graft.mm.{FixedPoint, MatrixIO}
import org.scalatest.funsuite.AnyFunSuite

class DamdsConfigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fromProperties parses the reference's config keys and defaults") {
    val dir = Files.createTempDirectory("graft-damds-cfg").toString
    Files.write(Paths.get(s"$dir/config.properties"),
      ("DistanceMatrixFile = /data/d.bin\n" +
        "NumberDataPoints = 100\n" +
        "TargetDimension = 2\n" +
        "Alpha = 0.9\n" +
        "CGIterations = 15\n" +
        "MaxTempLoops = 3\n" +
        "IsBigEndian = true\n").getBytes)
    val job = DamdsConfig.fromProperties(s"$dir/config.properties")
    assert(job.distanceMatrixFile == "/data/d.bin")
    assert(job.numberDataPoints == 100)
    assert(job.bigEndian)
    // default weights.bin does not exist -> constant weight 1.0 mode
    assert(job.weightMatrixFile.isEmpty)
    assert(job.cfg.targetDim == 2 && job.cfg.alpha == 0.9)
    assert(job.cfg.cgIter == 15 && job.cfg.maxTempLoops == 3)
    // untouched keys keep the reference defaults
    assert(job.cfg.threshold == 1e-6 && job.cfg.tMinFactor == 0.5)
    assert(job.cfg.maxStressLoops == 0)
  }

  test("an existing per-cell weight matrix file is picked up (non-simple mode)") {
    val dir = Files.createTempDirectory("graft-damds-w").toString
    graft.mm.MatrixIO.writeShortMatrix(s"$dir/w.bin", Array[Short](1, 2, 3, 4))
    Files.write(Paths.get(s"$dir/config.properties"),
      (s"DistanceMatrixFile = $dir/d.bin\nWeightMatrixFile = $dir/w.bin\n" +
        "NumberDataPoints = 2\n").getBytes)
    val job = DamdsConfig.fromProperties(s"$dir/config.properties")
    assert(job.weightMatrixFile.contains(s"$dir/w.bin"))
  }

  test("InitialPointsFile seeds the embedding when present") {
    val dir = Files.createTempDirectory("graft-damds-init").toString
    Files.write(Paths.get(s"$dir/init.txt"),
      "0.1 0.2\n0.3 0.4\n".getBytes)
    Files.write(Paths.get(s"$dir/c.properties"),
      (s"NumberDataPoints = 2\nTargetDimension = 2\n" +
        s"InitialPointsFile = $dir/init.txt\n").getBytes)
    val job = DamdsConfig.fromProperties(s"$dir/c.properties")
    assert(DamdsConfig.initialX(job).toSeq == Seq(0.1, 0.2, 0.3, 0.4))
    // absent file -> seeded random of the right size
    Files.write(Paths.get(s"$dir/c2.properties"),
      "NumberDataPoints = 5\nTargetDimension = 3\n".getBytes)
    val job2 = DamdsConfig.fromProperties(s"$dir/c2.properties")
    val x = DamdsConfig.initialX(job2)
    assert(x.length == 15 && x.forall(v => v >= -0.5 && v < 0.5))
  }

  test("an explicitly configured missing weight/init file fails fast") {
    val dir = Files.createTempDirectory("graft-damds-miss").toString
    Files.write(Paths.get(s"$dir/c.properties"),
      (s"NumberDataPoints = 4\nWeightMatrixFile = $dir/typo.bin\n").getBytes)
    val e = intercept[IllegalArgumentException] {
      DamdsConfig.fromProperties(s"$dir/c.properties")
    }
    assert(e.getMessage.contains("does not exist"))
    Files.write(Paths.get(s"$dir/c2.properties"),
      (s"NumberDataPoints = 4\nInitialPointsFile = $dir/nope.txt\n").getBytes)
    val e2 = intercept[IllegalArgumentException] {
      DamdsConfig.fromProperties(s"$dir/c2.properties")
    }
    assert(e2.getMessage.contains("does not exist"))
    // the DEFAULT names absent keep the reference's silent fallback
    Files.write(Paths.get(s"$dir/c3.properties"),
      "NumberDataPoints = 4\n".getBytes)
    val job = DamdsConfig.fromProperties(s"$dir/c3.properties")
    assert(job.weightMatrixFile.isEmpty && job.initialPointsFile.isEmpty)
    // spelling out the default name keeps the fallback too (a filled-in
    // template is not a typo)
    Files.write(Paths.get(s"$dir/c4.properties"),
      "NumberDataPoints = 4\nWeightMatrixFile = weights.bin\n".getBytes)
    val job4 = DamdsConfig.fromProperties(s"$dir/c4.properties")
    assert(job4.weightMatrixFile.isEmpty)
  }

  test("unsupported DistanceTransform is rejected, not silently dropped") {
    val dir = Files.createTempDirectory("graft-damds-rej").toString
    Files.write(Paths.get(s"$dir/c.properties"),
      "NumberDataPoints = 4\nDistanceTransform = 0.5\n".getBytes)
    val e = intercept[IllegalArgumentException] {
      DamdsConfig.fromProperties(s"$dir/c.properties")
    }
    assert(e.getMessage.contains("not supported"))
  }

  test("IsSimpleWeights routes the weight file to per-point mode; IsSammon sets the factor") {
    val dir = Files.createTempDirectory("graft-damds-sw").toString
    Files.write(Paths.get(s"$dir/sw.txt"), "1.0 2.0 0.5 1.5".getBytes)
    Files.write(Paths.get(s"$dir/c.properties"),
      (s"NumberDataPoints = 4\nWeightMatrixFile = $dir/sw.txt\n" +
        "IsSimpleWeights = true\nIsSammon = true\n").getBytes)
    val job = DamdsConfig.fromProperties(s"$dir/c.properties")
    assert(job.weightMatrixFile.isEmpty)
    assert(job.simpleWeightsFile.contains(s"$dir/sw.txt"))
    assert(job.cfg.sammonFactor == 0.001)
  }

  test("simple weights: block w(i,j) = w_i * w_j; sammon floors by distance") {
    import graft.damds.DamdsKernels.DamdsBlock
    import graft.mm.FixedPoint
    val n = 3
    val rw = Array(2.0, 0.5, 3.0)
    val dist = Array.tabulate(n * n)(i => FixedPoint.encode(0.1 * (i % n)))
    val plain = DamdsBlock(0, 0, n, n, dist, Array.empty, rw)
    assert(plain.w(0, 1) == 2.0 * 0.5)
    assert(plain.w(2, 0) == 3.0 * 2.0)
    // sammon: w / max(d, factor * avgDist); pick factor*avg larger than
    // the cell distance so the floor binds
    val sam = plain.copy(sammonFactor = 0.5, avgDist = 1.0)
    val expectFloor = (2.0 * 0.5) / 0.5 // d(0,1)=0.1 < 0.5 -> floor
    assert(math.abs(sam.w(0, 1) - expectFloor) < 1e-9)
    // and when the distance exceeds the floor it divides by the distance
    val d02 = FixedPoint.decode(dist(2)) // 0.2
    assert(math.abs(sam.w(0, 2) - (2.0 * 3.0) / math.max(d02, 0.5)) < 1e-9)
  }

  test("run with all-ones simple weights equals the constant-weight run") {
    val dir = Files.createTempDirectory("graft-damds-eq").toString
    val n = 24
    val rnd = new scala.util.Random(31)
    val pts = Array.fill(n * 2)(rnd.nextDouble())
    val dist = new Array[Double](n * n)
    var mx = 0.0
    for (i <- 0 until n; j <- 0 until n) {
      val dx = pts(i * 2) - pts(j * 2); val dy = pts(i * 2 + 1) - pts(j * 2 + 1)
      val d = math.sqrt(dx * dx + dy * dy)
      dist(i * n + j) = d; mx = math.max(mx, d)
    }
    graft.mm.MatrixIO.writeShortMatrix(s"$dir/d.bin",
      dist.map(v => graft.mm.FixedPoint.encode(v / mx)))
    Files.write(Paths.get(s"$dir/ones.txt"),
      Array.fill(n)("1.0").mkString(" ").getBytes)
    val initRnd = new scala.util.Random(7)
    val init = Array.fill(n * 2)(initRnd.nextDouble() - 0.5)
    val cfg = Damds.Config(targetDim = 2, cgIter = 8,
      maxStressLoops = 1, maxTempLoops = 1)
    def blocks(sw: Option[String]) = DamdsIO.loadSideRead(
      TestSpark.spark, s"$dir/d.bin", None, n, 4, simpleWeightsFile = sw)
    val a = Damds.run(spark, blocks(None), init.clone(), n, cfg)
    val b = Damds.run(spark, blocks(Some(s"$dir/ones.txt")), init.clone(), n, cfg)
    assert(a.x.toSeq == b.x.toSeq)
    assert(a.state.stress == b.state.stress)
  }

  test("run executes the pipeline from a config file end to end") {
    val dir = Files.createTempDirectory("graft-damds-run").toString
    val n = 32
    // distances from seeded 2-D points, normalized, fixed-point
    val rnd = new scala.util.Random(23)
    val pts = Array.fill(n * 2)(rnd.nextDouble())
    val dist = new Array[Double](n * n)
    var mx = 0.0
    for (i <- 0 until n; j <- 0 until n) {
      val dx = pts(i * 2) - pts(j * 2); val dy = pts(i * 2 + 1) - pts(j * 2 + 1)
      val d = math.sqrt(dx * dx + dy * dy)
      dist(i * n + j) = d; mx = math.max(mx, d)
    }
    MatrixIO.writeShortMatrix(s"$dir/d.bin",
      dist.map(d => FixedPoint.encode(d / mx)), bigEndian = true)
    Files.write(Paths.get(s"$dir/config.properties"),
      (s"DistanceMatrixFile = $dir/d.bin\n" +
        s"NumberDataPoints = $n\n" +
        "TargetDimension = 2\n" +
        "IsBigEndian = true\n" +
        "MaxTempLoops = 2\n" +
        "MaxStressLoops = 1\n" +
        "CGIterations = 8\n").getBytes)
    val job = DamdsConfig.fromProperties(s"$dir/config.properties", splits = 4)
    val initRnd = new scala.util.Random(7)
    val init = Array.fill(n * 2)(initRnd.nextDouble() - 0.5)
    val res = DamdsConfig.run(spark, job, init)
    assert(res.x.length == n * 2)
    assert(res.x.forall(v => !v.isNaN && !v.isInfinite))
    // stress values at different temperatures are not comparable to each
    // other (the annealed target moves); check they are finite/positive
    // and that the configured loop caps were honored
    assert(res.stressLog.nonEmpty)
    assert(res.stressLog.forall(s => s > 0 && !s.isNaN && !s.isInfinite))
    assert(res.state.tItr == 2)
  }
}
