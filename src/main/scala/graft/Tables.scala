package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures (see TESTDATA.md).
  *
  * All tables are plain parquet files under a scale-factor directory; at
  * cluster scale these would be partitioned/bucketed datasets, so every
  * query built on top must keep filters/projection pushdown-friendly
  * (verified via `.explain("formatted")` → `PushedFilters`/`ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
