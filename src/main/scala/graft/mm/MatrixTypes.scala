package graft.mm

/** Dense-matrix data model (reference: mm/Matrix.java:10-27,
  * mm/MatrixBlock.java:8-18, mm/DoubleMatrixBlock.java:3-5,
  * mm/ShortMatrixBlock.java:3-5).
  *
  * A matrix is row-partitioned into horizontal blocks; each block knows
  * its global shape, first global row and ordinal, so the ordered gather
  * (A4) can reassemble and hard-fail on gaps. Unlike the reference,
  * block height is bounded by the caller (SURVEY §7.4 risk 3): one
  * record is never "the whole split" at scale.
  */
final case class DoubleMatrixBlock(
    index: Int,
    start: Int,
    blockRows: Int,
    matrixRows: Int,
    matrixCols: Int,
    data: Array[Double]) {
  require(data.length == blockRows * matrixCols,
    s"block $index: data ${data.length} != $blockRows x $matrixCols")
}

/** 16-bit fixed-point block (reference N7: values decode as
  * short * (1/Short.MaxValue), damds/DAMDSUtils.java:8-9) — a 4x
  * compression of the N×N distance/weight matrices.
  */
final case class ShortMatrixBlock(
    index: Int,
    start: Int,
    blockRows: Int,
    matrixRows: Int,
    matrixCols: Int,
    data: Array[Short])

object FixedPoint {
  val InvShortMax: Double = 1.0 / Short.MaxValue
  def decode(s: Short): Double = s * InvShortMax
  def encode(d: Double): Short = (d * Short.MaxValue).toShort
}
