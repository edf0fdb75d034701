package graft.damds

import graft.damds.DamdsKernels.DamdsBlock
import graft.mm.MatrixIO
import org.apache.spark.sql.{Dataset, SparkSession}

/** Loaders pairing each distance block with its weight block — the
  * reference's two strategies (damds/Distances.java):
  *
  *  - J1 `loadJoin` (Distances.java:46-69): two independent scans, then
  *    an equi inner join on the block index. In Spark both sides are
  *    1-row-per-key datasets; `joinWith` on index lets Catalyst pick the
  *    join (sort-merge at scale, broadcast if one side is tiny).
  *  - J2/S10 `loadSideRead` ("filReadJoin", Distances.java:71-106 +
  *    readFile/readHDFSFile :108-160): a single scan whose map opens the
  *    weight file directly and reads the matching row range — zero
  *    shuffle. On a cluster the open() goes through the shared
  *    filesystem exactly like the reference's HDFS branch.
  *
  * Both produce identical `DamdsBlock`s (proven in DamdsIOSpec); the
  * side-read is the scale path (no co-partitioning needed), the join is
  * the declarative path when weights arrive as a real dataset.
  */
object DamdsIO {

  /** J1: scan distances and weights separately, equi-join on index. */
  def loadJoin(spark: SparkSession, distFile: String, weightFile: String,
      n: Int, numSplits: Int, bigEndian: Boolean = true)
      : Dataset[DamdsBlock] = {
    import spark.implicits._
    val dist = MatrixIO.shortMatrixBlocks(spark, distFile, n, n, numSplits,
      bigEndian)
    val weight = MatrixIO.shortMatrixBlocks(spark, weightFile, n, n,
      numSplits, bigEndian)
    dist.joinWith(weight, dist("index") === weight("index"), "inner")
      .map { case (d, w) =>
        DamdsBlock(d.index, d.start, d.blockRows, d.matrixCols, d.data,
          w.data)
      }
  }

  /** J2/S10: one scan; each task side-reads its weight row range from
    * the file. `weightFile = None` gives constant weight 1.0 (the
    * reference's missing-weight-file mode, io/RowBlock.java:101-103);
    * `simpleWeightsFile` instead loads N per-point doubles (text,
    * whitespace-separated) for the reference's IsSimpleWeights w_i·w_j
    * mode (RowBlock.java:98-99,127-129).
    */
  def loadSideRead(spark: SparkSession, distFile: String,
      weightFile: Option[String], n: Int, numSplits: Int,
      bigEndian: Boolean = true,
      simpleWeightsFile: Option[String] = None): Dataset[DamdsBlock] = {
    import spark.implicits._
    require(weightFile.isEmpty || simpleWeightsFile.isEmpty,
      "per-cell weightFile and per-point simpleWeightsFile are exclusive")
    val splits = MatrixIO.rowSplits(n, numSplits)
    spark.createDataset(splits.zipWithIndex)
      .repartition(splits.size)
      .map { case ((start, blockRows), idx) =>
        val dist = MatrixIO.readShortSlice(distFile, n, start, blockRows,
          bigEndian)
        val w = weightFile match {
          case Some(f) => MatrixIO.readShortSlice(f, n, start, blockRows,
            bigEndian)
          case None => Array.empty[Short]
        }
        val rw = simpleWeightsFile match {
          case Some(f) =>
            val vals = scala.io.Source.fromFile(f).mkString.trim
              .split("\\s+").map(_.toDouble)
            require(vals.length == n,
              s"simple weights file $f has ${vals.length} values, want $n")
            vals
          case None => Array.empty[Double]
        }
        DamdsBlock(idx, start, blockRows, n, dist, w, rw)
      }
  }
}
