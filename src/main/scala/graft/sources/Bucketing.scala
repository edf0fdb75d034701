package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located-join story at 100 TB: write
  * both sides of a recurring equi-join bucketed (and sorted) by the
  * join key, and every subsequent join on that key runs with ZERO
  * shuffle (Catalyst proves the partitioning requirement is already
  * met by the bucket spec; BucketingSpec asserts no Exchange in the
  * plan). This is Spark's durable form of the reference's co-partition
  * assumption between distance and weight blocks (J1).
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted parquet table. */
  def writeBucketed(df: DataFrame, path: String, table: String,
      bucketCol: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
