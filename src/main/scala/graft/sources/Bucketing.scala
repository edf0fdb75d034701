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

  /** Write `df` as an external bucketed+sorted parquet table.
    *
    * The pre-write `repartition(buckets, bucketCol)` uses the same
    * murmur3 HashPartitioning as the bucket spec, so each task holds
    * exactly one bucket and the table lands as `buckets` files instead
    * of (input partitions × buckets) small files — one cheap shuffle at
    * build time for a layout that every subsequent zero-shuffle join
    * reads efficiently. */
  def writeBucketed(df: DataFrame, path: String, table: String,
      bucketCol: String, buckets: Int): Unit =
    df.repartition(buckets, df(bucketCol))
      .write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
