package graft.mm

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MatrixDataSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft-matrix DSv2 reads a double matrix row-per-record") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dsv2").toString
    val rows = 37; val cols = 5
    val data = MatrixIO.randomMatrix(rows, cols, seed = 9L)
    MatrixIO.writeDoubleMatrix(s"$dir/a.bin", data)
    val df = spark.read.format("graft-matrix")
      .option("path", s"$dir/a.bin")
      .option("rows", rows).option("cols", cols)
      .option("splits", 4)
      .load()
    assert(df.count() == rows)
    assert(df.schema.fieldNames.toSeq == Seq("row", "values"))
    val got = df.orderBy($"row").collect().flatMap(
      _.getAs[scala.collection.Seq[Double]]("values"))
    assert(got.toSeq == data.toSeq)
    // partition count follows the splits option
    assert(df.rdd.getNumPartitions == 4)
  }

  test("graft-matrix DSv2 decodes short fixed-point input to double") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dsv2s").toString
    val rows = 10; val cols = 3
    val shorts = Array.tabulate[Short](rows * cols)(i => (i * 100).toShort)
    MatrixIO.writeShortMatrix(s"$dir/s.bin", shorts)
    val df = spark.read.format("graft-matrix")
      .option("path", s"$dir/s.bin")
      .option("rows", rows).option("cols", cols)
      .option("valueType", "short").option("splits", 3)
      .load()
    val got = df.orderBy($"row").collect().flatMap(
      _.getAs[scala.collection.Seq[Double]]("values"))
    assert(got.toSeq == shorts.map(FixedPoint.decode).toSeq)
  }

  test("SQL over the DSv2 scan: aggregate matrix rows relationally") {
    val dir = Files.createTempDirectory("graft-dsv2q").toString
    val rows = 20; val cols = 4
    val data = Array.tabulate(rows * cols)(i => (i % 7).toDouble)
    MatrixIO.writeDoubleMatrix(s"$dir/m.bin", data)
    spark.read.format("graft-matrix")
      .option("path", s"$dir/m.bin")
      .option("rows", rows).option("cols", cols).load()
      .createOrReplaceTempView("mtx")
    val total = spark.sql(
      "SELECT sum(aggregate(values, cast(0.0 as double), (a, x) -> a + x)) FROM mtx")
      .head().getDouble(0)
    assert(total == data.sum)
  }
}
