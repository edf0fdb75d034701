package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` has shipped `ts` in two physical forms across
    * fixture generations: parquet TIMESTAMP(NANOS) — which Spark 4
    * rejects (PARQUET_TYPE_ILLEGAL) unless read as a raw long — and
    * plain TIMESTAMP(MICROS). We resolve with nanos-as-long set and
    * branch on what the footer actually declares: a long column is
    * nanos and becomes a micros timestamp (truncating, matching
    * DuckDB's `epoch_us`/timestamp-cast semantics on the same file), a
    * timestamp column is already micros and passes through — so either
    * fixture generation yields the same logical `ts` and oracle SQL
    * keeps using `ts` natively.
    *
    * The nanosAsLong flag is a session conf (no per-read DataFrameReader
    * option exists), but it is only consulted during the eager schema
    * resolution inside `spark.read.parquet`, so it is scoped here: set,
    * resolve, then restored to its prior value — a later read of some
    * OTHER nanos-timestamp parquet is not silently affected by this one.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    withNanosAsLong(spark) {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      if (eventsTsIsNanosLong(raw)) // nanos-generation file
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else
        // micros-generation file: resolves as TIMESTAMP_NTZ; cast to
        // the session-TZ timestamp the nanos path produced (session TZ
        // is pinned UTC, so the micros value is unchanged) — every
        // downstream query and oracle sees one ts type either way
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }

  /** True when this events frame's `ts` resolved as a raw long — the
    * nanos-generation fixture that needs the div-1000 repair. Shared
    * with the streaming reader so both paths branch identically. */
  def eventsTsIsNanosLong(events: DataFrame): Boolean =
    events.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType

  /** Run `body` (which must plan/execute eagerly — conf scope ends at
    * return) with the given session confs set, restoring priors after.
    * The one save/set/restore implementation every scoped-conf query
    * shares: the Some/None restore branch is easy to get subtly wrong
    * per copy, and a wrong branch leaks conf state across queries in
    * the shared session. */
  def withConfs[A](spark: SparkSession, pairs: Seq[(String, String)])
      (body: => A): A = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Run `body` (which must do its schema resolution eagerly) with the
    * nanosAsLong flag set, restoring the prior value after. */
  def withNanosAsLong[A](spark: SparkSession)(body: => A): A =
    withConfs(spark, Seq("spark.sql.legacy.parquet.nanosAsLong" -> "true"))(body)
}
