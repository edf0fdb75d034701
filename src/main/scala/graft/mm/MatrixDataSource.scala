package graft.mm

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 for the reference's headerless binary matrix files
  * (S1–S3 as a SQL-visible scan):
  *
  * {{{
  * spark.read.format("graft-matrix")
  *   .option("path", "/data/A.bin").option("rows", 4096)
  *   .option("cols", 64).option("valueType", "double")   // or "short"
  *   .option("bigEndian", true).option("splits", 32)
  *   .load()   // => (row: bigint, values: array<double>)
  * }}}
  *
  * Shape is external (the files have no header), exactly like the
  * reference's config-driven input formats. Partitions are the S1
  * row-aligned q/r splits; each task side-reads its byte range (the S7
  * pattern), and records are single matrix ROWS — bounded size at any
  * matrix width, per SURVEY §7.4 risk 3, instead of the reference's
  * one-record-per-split blocks. Short inputs are decoded to double via
  * the N7 fixed-point codec.
  */
class MatrixDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-matrix"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MatrixDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new MatrixTable(new CaseInsensitiveStringMap(properties))
}

object MatrixDataSource {
  val schema: StructType = StructType(Seq(
    StructField("row", LongType, nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  final case class Conf(path: String, rows: Int, cols: Int,
      isShort: Boolean, bigEndian: Boolean, splits: Int)

  def conf(o: CaseInsensitiveStringMap): Conf = {
    require(o.containsKey("path") && o.containsKey("rows") &&
      o.containsKey("cols"), "graft-matrix needs path, rows, cols options")
    val vt = o.getOrDefault("valuetype", "double").toLowerCase
    require(vt == "double" || vt == "short", s"bad valueType $vt")
    Conf(o.get("path"), o.get("rows").toInt, o.get("cols").toInt,
      vt == "short", o.getBoolean("bigendian", true),
      o.getInt("splits", 8))
  }
}

final class MatrixTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val c = MatrixDataSource.conf(options)
  override def name(): String = s"graft-matrix(${c.path})"
  override def schema(): StructType = MatrixDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new MatrixScan(c)
    }
}

final case class MatrixPartition(start: Int, blockRows: Int)
    extends InputPartition

final class MatrixScan(c: MatrixDataSource.Conf) extends Scan with Batch {
  override def readSchema(): StructType = MatrixDataSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    MatrixIO.rowSplits(c.rows, c.splits)
      .map { case (s, n) => MatrixPartition(s, n): InputPartition }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new MatrixReaderFactory(c)
}

final class MatrixReaderFactory(c: MatrixDataSource.Conf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val mp = p.asInstanceOf[MatrixPartition]
    new PartitionReader[InternalRow] {
      private val data: Array[Double] =
        if (c.isShort)
          MatrixIO.readShortSlice(c.path, c.cols, mp.start, mp.blockRows,
            c.bigEndian).map(FixedPoint.decode)
        else
          MatrixIO.readDoubleSlice(c.path, c.cols, mp.start, mp.blockRows,
            c.bigEndian)
      private var i = -1
      override def next(): Boolean = { i += 1; i < mp.blockRows }
      override def get(): InternalRow = {
        val row = new Array[Double](c.cols)
        System.arraycopy(data, i * c.cols, row, 0, c.cols)
        new GenericInternalRow(Array[Any](
          (mp.start + i).toLong, new GenericArrayData(row)))
      }
      override def close(): Unit = ()
    }
  }
}
