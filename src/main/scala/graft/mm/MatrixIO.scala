package graft.mm

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

import org.apache.spark.sql.{Dataset, SparkSession}

/** Binary headerless matrix sources/sinks (reference S1–S3 + G1:
  * mm/MatrixInputFormat.java:25-62, mm/DoubleMatrixInputFormat.java:19-50,
  * mm/ShortMatrixInputFormat.java:21-75, mm/MatrixFileGenerator.java:55-197).
  *
  * Shape is external (headerless file, rows×cols supplied by the caller)
  * and endianness is a reader flag, exactly like the reference. The scan
  * is `spark.range(numSplits).mapPartitions(readSlice)`: each task
  * computes its row-aligned range with the reference's q/r remainder
  * distribution and side-reads its slice — the S7 "self-loading row
  * block" pattern. On a real cluster the open() goes through Hadoop
  * FileSystem for locality; the split math is identical.
  */
object MatrixIO {

  /** Row-aligned split ranges: split i gets q + (i < r ? 1 : 0) rows
    * (reference split math, mm/MatrixInputFormat.java:33-45). Returns
    * (start, blockRows) per split; empty splits are dropped.
    */
  def rowSplits(rows: Int, numSplits: Int): IndexedSeq[(Int, Int)] = {
    require(rows >= 0 && numSplits > 0)
    val q = rows / numSplits
    val r = rows % numSplits
    (0 until numSplits).map { i =>
      (i * q + math.min(i, r), q + (if (i < r) 1 else 0))
    }.filter(_._2 > 0)
  }

  private def order(bigEndian: Boolean): ByteOrder =
    if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN

  /** Read one row range of a headerless double matrix file. */
  def readDoubleSlice(path: String, cols: Int, start: Int, blockRows: Int,
      bigEndian: Boolean): Array[Double] = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val bytes = blockRows.toLong * cols * 8
      require(bytes <= Int.MaxValue, s"block too large: $bytes bytes")
      val buf = ByteBuffer.allocate(bytes.toInt).order(order(bigEndian))
      ch.position(start.toLong * cols * 8)
      while (buf.hasRemaining && ch.read(buf) >= 0) {}
      require(!buf.hasRemaining, s"short read at row $start")
      buf.flip()
      val out = new Array[Double](blockRows * cols)
      buf.asDoubleBuffer().get(out)
      out
    } finally ch.close()
  }

  /** Read one row range of a headerless short (fixed-point) matrix file. */
  def readShortSlice(path: String, cols: Int, start: Int, blockRows: Int,
      bigEndian: Boolean): Array[Short] = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val bytes = blockRows.toLong * cols * 2
      require(bytes <= Int.MaxValue, s"block too large: $bytes bytes")
      val buf = ByteBuffer.allocate(bytes.toInt).order(order(bigEndian))
      ch.position(start.toLong * cols * 2)
      while (buf.hasRemaining && ch.read(buf) >= 0) {}
      require(!buf.hasRemaining, s"short read at row $start")
      buf.flip()
      val out = new Array[Short](blockRows * cols)
      buf.asShortBuffer().get(out)
      out
    } finally ch.close()
  }

  /** Distributed scan of a binary double matrix into row blocks (S1+S2). */
  def doubleMatrixBlocks(spark: SparkSession, path: String, rows: Int,
      cols: Int, numSplits: Int, bigEndian: Boolean = true)
      : Dataset[DoubleMatrixBlock] = {
    import spark.implicits._
    val splits = rowSplits(rows, numSplits)
    spark.createDataset(splits.zipWithIndex)
      .repartition(splits.size)
      .map { case ((start, blockRows), idx) =>
        DoubleMatrixBlock(idx, start, blockRows, rows, cols,
          readDoubleSlice(path, cols, start, blockRows, bigEndian))
      }
  }

  /** Distributed scan of a binary short matrix into row blocks (S1+S3). */
  def shortMatrixBlocks(spark: SparkSession, path: String, rows: Int,
      cols: Int, numSplits: Int, bigEndian: Boolean = true)
      : Dataset[ShortMatrixBlock] = {
    import spark.implicits._
    val splits = rowSplits(rows, numSplits)
    spark.createDataset(splits.zipWithIndex)
      .repartition(splits.size)
      .map { case ((start, blockRows), idx) =>
        ShortMatrixBlock(idx, start, blockRows, rows, cols,
          readShortSlice(path, cols, start, blockRows, bigEndian))
      }
  }

  // ---- G1-style fixture generators / writers (driver-side) ----

  /** Write a headerless double matrix (row-major) binary file. */
  def writeDoubleMatrix(path: String, data: Array[Double],
      bigEndian: Boolean = true): Unit = {
    val buf = ByteBuffer.allocate(data.length * 8).order(order(bigEndian))
    buf.asDoubleBuffer().put(data)
    val out = new BufferedOutputStream(new FileOutputStream(path))
    try out.write(buf.array()) finally out.close()
  }

  /** Write a headerless short matrix binary file. */
  def writeShortMatrix(path: String, data: Array[Short],
      bigEndian: Boolean = true): Unit = {
    val buf = ByteBuffer.allocate(data.length * 2).order(order(bigEndian))
    buf.asShortBuffer().put(data)
    val out = new BufferedOutputStream(new FileOutputStream(path))
    try out.write(buf.array()) finally out.close()
  }

  /** Seeded random matrix (reference MatrixFileGenerator semantics). */
  def randomMatrix(rows: Int, cols: Int, seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(rows * cols)(rnd.nextDouble())
  }

  /** Tab-separated text points file (G1 writePointsFile / S4 parse). */
  def writePointsText(path: String, data: Array[Double], cols: Int): Unit = {
    val w = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)))
    try {
      var i = 0
      while (i < data.length / cols) {
        val row = (0 until cols).map(j => data(i * cols + j)).mkString("\t")
        w.write((row + "\n").getBytes("UTF-8"))
        i += 1
      }
    } finally w.close()
  }
}
