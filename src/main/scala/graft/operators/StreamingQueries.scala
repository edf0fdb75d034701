package graft.operators

import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Driver-visible, oracle-checked proofs of the Structured Streaming
  * surface: each query runs a real `readStream` → transform →
  * `writeStream` pipeline to completion (file source over the events
  * parquet, memory sink, Trigger.AvailableNow) and returns the sink
  * table — so the DuckDB batch SQL oracle checks that the STREAMING
  * execution produces exactly the batch answer.
  *
  * Complete output mode is used so every window reaches the sink (in
  * append mode the trailing windows stay unflushed when the input
  * ends — the watermark never passes them); production jobs on
  * unbounded input use the append-mode forms in graft.streaming with
  * watermark-bounded state, spec-tested on MemoryStreams.
  */
object StreamingQueries {

  // events.parquet raw schema with TIMESTAMP(NANOS) read as long (the
  // Spark 4 nanos contract — see Tables.events)
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val sinkId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Stream the events file through `transform` into a memory sink and
    * return the sink table. */
  private def runStream(s: SparkSession, dir: String,
      transform: DataFrame => DataFrame,
      mode: String = "complete"): DataFrame =
    graft.Tables.withNanosAsLong(s) {
      // the file stream source lists a DIRECTORY; the glob filter picks
      // out the events file from the shared sf dir
      val raw = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val name = s"graft_stream_sink_${sinkId.incrementAndGet()}"
      val q = transform(raw).writeStream
        .format("memory").queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
    }

  // ---- s01: streaming hourly window agg == batch q17 ----
  private def s01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    runStream(s, dir, StreamingOps.hourlyAgg(_))
      .select($"hour", $"event_type", $"n", $"total_value")
  }
  private val s01Sql =
    """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---- s02: streaming session_window sessionization == batch q18 ----
  // sessionAgg emits one row per (user, gap-session); rolling those up
  // per user must equal the batch lag-based sessionization exactly
  private def s02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    runStream(s, dir, StreamingOps.sessionAgg(_))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
  }
  private val s02Sql =
    """WITH g AS (
      |  SELECT user_id,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM events)
      |SELECT user_id, CAST(SUM(new_sess) + 1 AS BIGINT) AS n_sessions,
      |  COUNT(*) AS n_events
      |FROM g GROUP BY user_id""".stripMargin

  // ---- s03: streaming dedup == batch DISTINCT ----
  // dropDuplicates in append mode emits the first occurrence of each
  // key and suppresses the rest — on bounded input that is exactly
  // DISTINCT (append works here: dedup rows flush immediately, nothing
  // waits on a watermark; the watermark-bounded production form is
  // StreamingOps.dedup, spec-tested).
  private def s03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    runStream(s, dir, _.dropDuplicates("user_id", "event_type")
      .select($"user_id", $"event_type"), mode = "append")
  }
  private val s03Sql =
    "SELECT DISTINCT user_id, event_type FROM events"

  val all: Seq[Q] = Seq(
    Q("s01_stream_hourly", s01, Some(s01Sql)),
    Q("s02_stream_sessions", s02, Some(s02Sql)),
    Q("s03_stream_dedup", s03, Some(s03Sql)))
}
