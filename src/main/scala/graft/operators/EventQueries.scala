package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Time-series / event-stream operators over the `events` table. Batch
  * forms here (oracle-checkable in DuckDB); the same logic is exposed over
  * Structured Streaming in graft.streaming (SURVEY.md §2.8 extension).
  */
object EventQueries {

  // ---- q17: tumbling 1h window aggregation ----
  private def q17(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 2))).cast("double")
          .as("total_value"))
  }
  private val q17Sql =
    """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---- q18: sessionization (30-min inactivity gap) via lag window ----
  private def q18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables(s, dir, "events")
      .withColumn("us", unix_micros($"ts"))
      .withColumn("new_sess",
        when($"us" - lag($"us", 1).over(w) > 1800000000L, 1L).otherwise(0L))
      .groupBy($"user_id")
      .agg((sum($"new_sess") + 1L).as("n_sessions"),
        count(lit(1)).as("n_events"))
  }
  private val q18Sql =
    """WITH g AS (
      |  SELECT user_id,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM events)
      |SELECT user_id, CAST(SUM(new_sess) + 1 AS BIGINT) AS n_sessions,
      |  COUNT(*) AS n_events
      |FROM g GROUP BY user_id""".stripMargin

  // ---- q23: semi-structured JSON extraction from the props column ----
  private def q23(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(
        count($"k").as("n_with_k"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
  }
  private val q23Sql =
    """SELECT event_type,
      |  COUNT(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MIN(k) AS min_k, MAX(k) AS max_k
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events) t
      |GROUP BY event_type""".stripMargin

  // ---- q24: interval self-join (batch form of streaming correlate) --
  // pairs of same-user events within 15 minutes (strictly after), a
  // time-bounded theta join; per-user pair counts keep the output small
  // while still forcing the full interval-join work
  private def q24(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "events")
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
    val l = e.select($"user_id", $"event_id".as("id_l"), $"us".as("us_l"))
    val r = e.select($"user_id", $"event_id".as("id_r"), $"us".as("us_r"))
    l.join(r, Seq("user_id"))
      .where($"us_r" > $"us_l" && $"us_r" <= $"us_l" + 900000000L)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"),
        max($"us_r" - $"us_l").cast("long").as("max_gap_us"))
  }
  private val q24Sql =
    """SELECT l.user_id, COUNT(*) AS n_pairs,
      |  CAST(MAX(epoch_us(r.ts) - epoch_us(l.ts)) AS BIGINT) AS max_gap_us
      |FROM events l JOIN events r ON l.user_id = r.user_id
      |  AND epoch_us(r.ts) > epoch_us(l.ts)
      |  AND epoch_us(r.ts) <= epoch_us(l.ts) + 900000000
      |GROUP BY l.user_id""".stripMargin

  // ---- q25: grouping sets over the hourly rollup ----
  private def q25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .withColumn("day", to_date($"ts"))
      .groupingSets(
        Seq(Seq($"day", $"event_type"), Seq($"day"), Seq($"event_type")),
        $"day", $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 2))).cast("double").as("total"))
  }
  private val q25Sql =
    """SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events
      |GROUP BY GROUPING SETS ((1, 2), (1), (2))""".stripMargin

  // ---- q29: as-of join (each click matched to the latest prior
  // purchase of the same user) ----
  // Implementation is the scale-correct union + last_value pattern: tag
  // both sides, one shuffle on user_id, sort within partition by
  // (ts, tag) — purchases sort before clicks at equal ts, matching
  // ASOF's c.ts >= p.ts — and carry the running last purchase ts
  // forward. No range fan-out, no per-row subquery; at 100 TB this is
  // one sort-merge pass, same shape as a sessionization. The oracle is
  // DuckDB's native ASOF JOIN.
  private def q29(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts", lit(1).as("tag"),
        lit(null).cast("timestamp").as("pts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select(lit(null).cast("long").as("event_id"), $"user_id", $"ts",
        lit(0).as("tag"), $"ts".as("pts"))
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"tag".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionAll(purchases)
      .withColumn("matched_purchase_ts", last($"pts", ignoreNulls = true).over(w))
      .filter($"tag" === 1 && $"matched_purchase_ts".isNotNull)
      .select($"event_id", $"user_id", $"ts", $"matched_purchase_ts")
  }
  private val q29Sql =
    """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |     p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, c.ts, p.ts AS matched_purchase_ts
      |FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin

  // ---- q32: pivot event types into per-day count columns ----
  // With a KNOWN value list the optimal pivot is one-pass conditional
  // aggregation: a single groupBy(day) shuffle with map-side partials.
  // (`.pivot(col, values)` is semantically identical but plans the
  // generic two-shuffle groupBy(day,type)→pivot shape; an UNLISTED
  // pivot additionally collects distinct values to the driver — both
  // avoidable here, so avoided.)
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")
  private def q32(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = eventTypes.map(t =>
      count(when($"event_type" === t, 1)).as(t))
    Tables(s, dir, "events")
      .withColumn("day", to_date($"ts"))
      .groupBy($"day")
      .agg(cells.head, cells.tail: _*)
  }
  private val q32Sql = {
    val cols = eventTypes.map(t =>
      s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS $t").mkString(",\n  ")
    s"""SELECT CAST(ts AS DATE) AS day,
       |  $cols
       |FROM events GROUP BY 1""".stripMargin
  }

  // ---- q33: rolling 1-hour RANGE frame per user ----
  // Value-based frame (RANGE, not ROWS) so tied timestamps form
  // identical frames in both engines; the rolling sum goes through
  // DECIMAL(18,2), which is order-independent and exact.
  private def q33(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-3600000000L, 0L)
    Tables(s, dir, "events")
      .select($"event_id", $"user_id",
        count(lit(1)).over(w).as("n_1h"),
        sum($"value".cast(DecimalType(18, 2))).over(w).cast("double")
          .as("sum_1h"))
  }
  private val q33Sql =
    """SELECT event_id, user_id,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  // ---- q36: ordered funnel analysis (view → click → purchase) ----
  // The product-analytics staple: how many users complete each stage
  // of an ORDERED event sequence (a later stage only counts if it
  // happens strictly after the user's entry into the previous one).
  // Scale shape: three user-keyed min-aggregations chained by
  // user-keyed joins — every exchange is on user_id, so the stages
  // reuse one partitioning; per-stage state is one timestamp per
  // user; the rollup is a 3-row union with a broadcast scalar for the
  // conversion denominator. Nothing quadratic, no windows, no
  // event-ordering sort — min(us) replaces a per-user ORDER BY.
  // Conversion is one IEEE division of exact counts, floor-snapped.
  // Stage 1 is the denominator BY DEFINITION (funnel entry): with no
  // 'view' events every stage count is 0 and 0/0 would emit NaN rows
  // (both engines agree, so the oracle can't catch it — ADVICE r11);
  // the nullif guard turns that degenerate funnel into NULL
  // conversions instead, which is what a downstream dashboard can
  // actually render.
  private def q36(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val t1 = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val t2 = e.filter($"event_type" === "click").join(t1, "user_id")
      .filter($"us" > $"t1")
      .groupBy($"user_id").agg(min($"us").as("t2"))
    val t3 = e.filter($"event_type" === "purchase").join(t2, "user_id")
      .filter($"us" > $"t2")
      .groupBy($"user_id").agg(min($"us").as("t3"))
    val counts = t1.agg(count(lit(1)).as("n"))
      .select(lit(1L).as("stage"), $"n")
      .unionByName(t2.agg(count(lit(1)).as("n"))
        .select(lit(2L).as("stage"), $"n"))
      .unionByName(t3.agg(count(lit(1)).as("n"))
        .select(lit(3L).as("stage"), $"n"))
    counts.crossJoin(broadcast(t1.agg(count(lit(1)).as("n_base"))))
      .select($"stage", $"n".as("n_users"),
        expr("floor(n / cast(nullif(n_base, 0) as double) * 1e6 + 0.5) / 1e6")
          .as("conv_from_view"))
  }
  private val q36Sql =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |t1 AS (SELECT user_id, MIN(us) AS t1 FROM e
      |  WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (SELECT e.user_id, MIN(us) AS t2 FROM e
      |  JOIN t1 ON e.user_id = t1.user_id
      |  WHERE event_type = 'click' AND us > t1 GROUP BY 1),
      |t3 AS (SELECT e.user_id, MIN(us) AS t3 FROM e
      |  JOIN t2 ON e.user_id = t2.user_id
      |  WHERE event_type = 'purchase' AND us > t2 GROUP BY 1),
      |c AS (SELECT 1 AS stage, CAST(COUNT(*) AS BIGINT) AS n FROM t1
      |  UNION ALL SELECT 2, CAST(COUNT(*) AS BIGINT) FROM t2
      |  UNION ALL SELECT 3, CAST(COUNT(*) AS BIGINT) FROM t3),
      |b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_base FROM t1)
      |SELECT CAST(stage AS BIGINT) AS stage, n AS n_users,
      |  floor(n / CAST(NULLIF(n_base, 0) AS DOUBLE) * 1e6 + 0.5) / 1e6
      |    AS conv_from_view
      |FROM c CROSS JOIN b""".stripMargin

  // ---- q37: cohort retention (first-seen day × activity offset) ----
  // The other product-analytics staple: bucket users by first-seen
  // day, then for each (cohort, day-offset) count how many are still
  // active. Scale shape: one user-keyed min-agg builds the cohort
  // map, the distinct (user, day) activity set joins it user-keyed
  // (same partitioning), and the retention matrix is a hash agg whose
  // cardinality is days² — driver-scale at any corpus size. The
  // distinct-user count per cell partial-aggregates; the rate is one
  // snapped division of exact counts. Dates are day-truncated in UTC
  // on both engines and emitted as ISO strings, so no timestamp
  // precision can leak into the compare.
  private def q37(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "events")
      .select($"user_id", to_date($"ts").as("day"))
    val cohort = e.groupBy($"user_id").agg(min($"day").as("cday"))
    val ret = e.distinct().join(cohort, "user_id")
      .groupBy($"cday", datediff($"day", $"cday").cast("long")
        .as("offset_days"))
      .agg(countDistinct($"user_id").as("n_active"))
    val sizes = cohort.groupBy($"cday").agg(count(lit(1)).as("cohort_n"))
    ret.join(sizes, "cday")
      .select($"cday".cast("string").as("cohort_day"), $"offset_days",
        $"n_active", $"cohort_n",
        expr("floor(n_active / cast(cohort_n as double) * 1e6 + 0.5) / 1e6")
          .as("retention"))
  }
  private val q37Sql =
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |c AS (SELECT user_id, MIN(day) AS cday FROM e GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, day FROM e),
      |r AS (SELECT cday, CAST(date_diff('day', cday, day) AS BIGINT)
      |    AS offset_days, CAST(COUNT(DISTINCT a.user_id) AS BIGINT)
      |    AS n_active
      |  FROM a JOIN c ON a.user_id = c.user_id GROUP BY 1, 2),
      |s AS (SELECT cday, CAST(COUNT(*) AS BIGINT) AS cohort_n FROM c
      |  GROUP BY 1)
      |SELECT CAST(r.cday AS VARCHAR) AS cohort_day, offset_days,
      |  n_active, cohort_n,
      |  floor(n_active / CAST(cohort_n AS DOUBLE) * 1e6 + 0.5) / 1e6
      |    AS retention
      |FROM r JOIN s ON r.cday = s.cday""".stripMargin

  // ---- q38: incremental rollup maintenance (merge, don't recompute) ----
  // The incremental-view-maintenance pattern every 100 TB rollup lives
  // by: when a new batch lands, the hourly aggregate is maintained by
  // aggregating ONLY the delta and MERGING it with the existing rollup
  // — count and DECIMAL-sum are mergeable partials, so merge ≡ full
  // recompute exactly. Here the parity of event_id plays the
  // base/delta snapshot tag: each half is rolled up independently (in
  // production the base rollup is a stored table — d34's ledger idea
  // applied to aggregates) and the merge is a key-wise sum. The oracle
  // is q17's FULL-recompute SQL verbatim: the incremental path must be
  // bit-identical to recomputation, which is precisely the IVM
  // contract. Scale shape: the delta agg touches only the delta; the
  // merge shuffles rollup-sized rows (hours × types), never events.
  private def q38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def rollup(df: DataFrame): DataFrame = df
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 2))).as("total_dec"))
    val e = Tables(s, dir, "events")
    val base = rollup(e.filter($"event_id" % 2 === 0))
    val delta = rollup(e.filter($"event_id" % 2 === 1))
    base.unionByName(delta)
      .groupBy($"hour", $"event_type")
      .agg(sum($"n").as("n"),
        sum($"total_dec").cast("double").as("total_value"))
  }

  // ---- q39: rollup maintenance under retractions (IVM with deletes) ----
  // q38 proves the append-only half of the incremental-view contract;
  // this is the other half (VERDICT r12 item 7): late-arriving
  // corrections RETRACT rows from an already-stored rollup. The
  // stored rollup (built over everything, before the corrections
  // arrived) is merged with a correction batch carried at NEGATIVE
  // multiplicity — count and DECIMAL-sum are abelian-group aggregates,
  // so retraction is just merging the delta with sign flipped, and
  // groups whose count cancels to zero are dropped. The oracle is the
  // full recompute over the surviving events verbatim: merge-with-
  // deletes must be bit-identical to recomputation (DECIMAL addition
  // is exact, so partial cancellation leaves exactly the survivors'
  // sum). Scale shape: the correction agg touches only the correction
  // batch; the merge shuffles rollup-sized rows (hours × types),
  // never events — the same contract a production compaction obeys.
  private def q39(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def rollup(df: DataFrame): DataFrame = df
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 2))).as("total_dec"))
    val e = Tables(s, dir, "events")
    val stored = rollup(e)
    // the correction batch: event_id % 10 == 3 turn out to be voids
    val retractions = rollup(e.filter($"event_id" % 10 === 3))
      .select($"hour", $"event_type", (-$"n").as("n"),
        (-$"total_dec").as("total_dec"))
    stored.unionByName(retractions)
      .groupBy($"hour", $"event_type")
      .agg(sum($"n").as("n_m"), sum($"total_dec").as("td"))
      .filter($"n_m" > 0)
      .select($"hour", $"event_type", $"n_m".as("n"),
        $"td".cast("double").as("total_value"))
  }
  private val q39Sql =
    """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events WHERE event_id % 10 <> 3 GROUP BY 1, 2""".stripMargin

  // ---- q40: sliding-window distinct users via mergeable HLL partials ----
  // The re-aggregation property that makes sketches the 100 TB answer
  // to "distinct users in every trailing 3-hour window": per-hour HLL
  // registers (the d49 engine keyed by hour bucket) are computed ONCE
  // from the events, and every window estimate is a register-only
  // bucket-wise max over 3 hourly partials — the events are never
  // re-scanned per window, where the exact form pays the window
  // overlap on raw rows (kept here as the audit column, the d49
  // discipline). The ORACLE computes each window's registers from the
  // RAW (window, user) union, so cross-engine equality IS the proof
  // that register merge ≡ full rescan, window by window. Hour buckets
  // are exact integer epoch-hours (unix_micros div 3600000000) — no
  // interval arithmetic to diverge. Scale shape: one scan → hours×256
  // register rows; the window fan-out explodes REGISTERS (3 rows per
  // register), never events.
  private val swHours = 3L

  /** Per-hour HLL registers straight from the event stream — no dedup
    * pass (max over a multiset equals max over its set), so the SAME
    * agg runs over a batch scan or an events readStream (s32: state =
    * hours×256 register rows, complete mode). Input needs (ts,
    * user_id). */
  private[operators] def hourRegisters(events: DataFrame): DataFrame =
    events
      .select(expr("unix_micros(ts) div 3600000000").as("hb"),
        expr("graft_md5_prefix(cast(cast(user_id as string) as binary), 12)")
          .as("h"))
      .select(col("hb"), expr("shiftright(h, 40)").as("bucket"),
        expr("h & 1099511627775").as("w"))
      .groupBy(col("hb"), col("bucket"))
      .agg(max(expr("case when w = 0 then 41 else 41 - length(bin(w)) end"))
        .as("r"))

  /** Register table → the full q40 result: window fan-out (registers
    * only), estimate, exact audit from the batch events. Shared by
    * q40 and the streaming register-maintenance leg (s32) so both
    * produce bit-identical output from any value-identical register
    * table. */
  private[operators] def slidingFinish(s: SparkSession, dir: String,
      regs: DataFrame): DataFrame = {
    import s.implicits._
    val hu = Tables(s, dir, "events")
      .select(expr("unix_micros(ts) div 3600000000").as("hb"), $"user_id")
      .distinct()
    val targets = hu.select($"hb".as("t")).distinct()
    // hour hb's registers serve windows ending at hb .. hb+2; windows
    // are only the hours present in the data (semi-join on targets)
    val winRegs = regs
      .withColumn("t", explode(array((0L until swHours).map(i =>
        $"hb" + lit(i)): _*)))
      .join(targets, Seq("t"), "left_semi")
      .groupBy($"t", $"bucket").agg(max($"r").as("r"))
    val est = TextQueries.hllEstimate(
      winRegs.select($"t".as("source"), $"bucket", $"r"))
    val exact = hu
      .withColumn("t", explode(array((0L until swHours).map(i =>
        $"hb" + lit(i)): _*)))
      .join(targets, Seq("t"), "left_semi")
      .select($"t", $"user_id").distinct()
      .groupBy($"t").agg(count(lit(1)).as("n_exact"))
    est.join(exact, est("source") === exact("t"))
      .select($"t".as("hour_id"), $"n_exact", $"est_distinct",
        expr("floor(abs(est_distinct - n_exact) / n_exact * 1e6 + 0.5) " +
          "/ 1e6").as("err_pct"))
  }

  private def q40(s: SparkSession, dir: String): DataFrame =
    slidingFinish(s, dir, hourRegisters(Tables(s, dir, "events")))
  private[operators] val q40Sql =
    """WITH hu AS (SELECT DISTINCT epoch_us(ts) // 3600000000 AS hb, user_id
      |  FROM events),
      |tg AS (SELECT DISTINCT hb AS t FROM hu),
      |wu AS (SELECT DISTINCT tg.t, hu.user_id
      |  FROM hu JOIN tg ON hu.hb BETWEEN tg.t - 2 AND tg.t),
      |h AS (SELECT t, CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
      |    1, 12) AS BIGINT) AS h FROM wu),
      |rg AS (SELECT t, h >> 40 AS bucket,
      |    MAX(CASE WHEN h & 1099511627775 = 0 THEN 41
      |      ELSE 41 - length(bin(h & 1099511627775)) END) AS r
      |  FROM h GROUP BY 1, 2),
      |es AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS nb,
      |    CAST(SUM(CAST(1 AS BIGINT) << (41 - r)) AS BIGINT) AS ps
      |  FROM rg GROUP BY 1),
      |er AS (SELECT t, nb,
      |    1.0351398986589102e17 / (ps + (256 - nb) * 2199023255552) AS raw
      |  FROM es),
      |ee AS (SELECT t,
      |    floor(CASE WHEN nb < 256 AND raw <= 640e0
      |      THEN 256e0 * ln(256e0 / (256 - nb)) ELSE raw END * 1e4 + 0.5)
      |      / 1e4 AS est_distinct FROM er),
      |ex AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_exact
      |  FROM wu GROUP BY 1)
      |SELECT ex.t AS hour_id, n_exact, est_distinct,
      |  floor(abs(est_distinct - n_exact) / n_exact * 1e6 + 0.5) / 1e6
      |    AS err_pct
      |FROM ex JOIN ee ON ex.t = ee.t""".stripMargin

  // ---- q41: exponentially decayed event counts (half-life rollup) ----
  // The freshness-weighted rollup monitoring dashboards run: each
  // event contributes value · 2^-age, age in whole half-lives (one
  // day) behind the anchor "now". The decay factor is a POWER OF TWO
  // on purpose — scaling a double by 2^-k only shifts its exponent,
  // so every per-event contribution is EXACT in both engines (no
  // transcendental exp/pow whose last ulp could differ cross-engine),
  // and the determinism discipline finishes the job: contributions
  // are floor-rounded to integer MICROS per event and summed as
  // BIGINTs — an order-independent integer sum, whatever partition
  // layout the 100 TB scan has. Scale shape: one scalar anchor (max
  // ts — a bounded driver gather), then one scan → 5-key hash agg
  // with map-side partials; the per-row transform is stateless, so it
  // lifts onto the events readStream as a complete-mode bounded agg
  // (s36, the s21/s22 counter family).
  private[operators] val q41HalfLifeUs = 86400000000L // one day

  /** Stateless decay + bounded rollup under a FIXED anchor (the
    * deployment's "now"; the gate pins it to the fixture's max ts so
    * stream ≡ batch ≡ oracle). */
  private[graft] def decayedCounts(events: DataFrame, anchorUs: Long)
      : DataFrame =
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("age", expr(
        s"(cast($anchorUs as bigint) - us) div cast($q41HalfLifeUs as bigint)"))
      .withColumn("contrib_us", expr(
        "cast(floor(value / cast(shiftleft(cast(1 as bigint), " +
          "cast(age as int)) as double) * 1000000.0 + 0.5) as bigint)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("total_value"),
        (sum(col("contrib_us")).cast("double") / 1000000.0)
          .as("decayed_value"))

  /** The anchor gather: one scalar off the table (max event time). */
  private[graft] def decayAnchorUs(events: DataFrame): Long =
    events.agg(max(unix_micros(col("ts")))).head.getLong(0)

  private def q41(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    decayedCounts(ev, decayAnchorUs(ev))
  }
  private[operators] val q41Sql =
    """WITH a AS (SELECT MAX(epoch_us(ts)) AS t FROM events),
      |c AS (SELECT event_type, value,
      |    (a.t - epoch_us(ts)) // 86400000000 AS age
      |  FROM events CROSS JOIN a)
      |SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  CAST(SUM(CAST(floor(value / CAST((CAST(1 AS BIGINT) << age) AS DOUBLE)
      |    * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0
      |    AS decayed_value
      |FROM c GROUP BY 1""".stripMargin

  // ---- q42: error-burst detection (gaps-and-islands runs) ----
  // The MATCH_RECOGNIZE-shaped sequence operator next to q36's funnel
  // and q18's sessionizer: per user, maximal runs of CONSECUTIVE
  // 'error' events in that user's event order (an alerting pipeline's
  // "N failures in a row" signal). Batch shape is the classic
  // gaps-and-islands rewrite — two user-keyed row_numbers whose
  // difference is constant within a run — so every exchange is on
  // user_id (one partitioning reused by both windows and the aggs)
  // and per-user window state is one counter, never a cross-user
  // sort. The streaming form replaces the windows with O(1) keyed
  // state per user (StreamingOps.errorRuns: last-seen cursor, open
  // run, closed-run rollup — the x11/s30 window→state rewrite), which
  // is how an unbounded event feed runs this with constant memory.
  private[operators] val q42MinRun = 2L

  private def q42(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val e = Tables(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"event_type" === "error")
    val we = Window.partitionBy($"user_id").orderBy($"rn".asc)
    val runs = e
      .withColumn("island", $"rn" - row_number().over(we))
      .groupBy($"user_id", $"island")
      .agg(count(lit(1)).as("len"))
    runs.groupBy($"user_id")
      .agg(sum(when($"len" >= q42MinRun, 1L).otherwise(0L)).as("n_runs"),
        max($"len").as("longest_run"),
        sum($"len").as("n_errors"))
      .filter($"longest_run" >= q42MinRun)
  }
  private[operators] val q42Sql =
    s"""WITH e AS (SELECT user_id, event_id,
       |    event_type = 'error' AS err,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS rn
       |  FROM events),
       |er AS (SELECT user_id,
       |    rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
       |      AS island
       |  FROM e WHERE err),
       |runs AS (SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
       |  FROM er GROUP BY 1, 2)
       |SELECT user_id,
       |  CAST(SUM(CASE WHEN len >= $q42MinRun THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_runs,
       |  CAST(MAX(len) AS BIGINT) AS longest_run,
       |  CAST(SUM(len) AS BIGINT) AS n_errors
       |FROM runs GROUP BY 1
       |HAVING MAX(len) >= $q42MinRun""".stripMargin

  // ---- q43: last-touch purchase attribution (running-state window) ----
  // The attribution staple: each purchase credits the user's most
  // recent preceding click within the attribution window (1 hour).
  // Batch shape: ONE user-keyed ordered window carrying a running
  // conditional max (the last click's timestamp) — no self-join, no
  // per-purchase probe — then a user-keyed rollup. Money rides as
  // integer CENTS (floor-form per event) so the sums are exact
  // BIGINTs in both engines. The streaming form keeps just that
  // running max as O(1) keyed state per user (StreamingOps
  // .attributionStats — the q42/x11 window→state rewrite), which is
  // how the live attribution feed runs with constant memory.
  private[operators] val q43WindowUs = 3600000000L // 1 hour

  private def q43(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "events")
      .withColumn("us", unix_micros($"ts"))
      .withColumn("last_click",
        max(when($"event_type" === "click", $"us")).over(w))
      .filter($"event_type" === "purchase")
      .withColumn("attributed",
        when($"last_click".isNotNull &&
          $"us" - $"last_click" <= q43WindowUs, 1L).otherwise(0L))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum($"attributed").as("n_attributed"),
        sum(when($"attributed" === 1L,
          expr("cast(floor(value * 100 + 0.5) as bigint)"))
          .otherwise(0L)).as("attr_value_cents"))
  }
  private[operators] val q43Sql =
    s"""WITH e AS (SELECT user_id, event_id, event_type, value,
       |    epoch_us(ts) AS us,
       |    MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS last_click
       |  FROM events),
       |p AS (SELECT user_id, value,
       |    CASE WHEN last_click IS NOT NULL
       |      AND us - last_click <= $q43WindowUs THEN 1 ELSE 0 END
       |      AS attributed
       |  FROM e WHERE event_type = 'purchase')
       |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       |  CAST(SUM(attributed) AS BIGINT) AS n_attributed,
       |  CAST(SUM(CASE WHEN attributed = 1
       |    THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
       |    AS BIGINT) AS attr_value_cents
       |FROM p GROUP BY 1""".stripMargin

  // ---- q44: session path mining (frequent event-type trigrams) ----
  // The journey-analysis primitive next to q36's fixed funnel: instead
  // of checking ONE prescribed order, mine every consecutive
  // 3-step path users actually take within a session (q18's 30-min
  // sessionizer) and report occurrence/session/user support. Scale
  // shape: the only per-row state is two LEAD slots inside per-user
  // windows (bounded by a user's history, the q18/q33 discipline);
  // the rollup key domain is |event_type|³ — a constant, not a
  // corpus function — so the agg is map-side-collapsed like d65's
  // matrix. All integer outputs.
  private def q44(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val sessioned = Tables(s, dir, "events")
      .withColumn("us", unix_micros($"ts"))
      .withColumn("new_sess",
        when($"us" - lag($"us", 1).over(w) > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum($"new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val w2 = Window.partitionBy($"user_id", $"sid")
      .orderBy($"ts".asc, $"event_id".asc)
    sessioned
      .withColumn("e2", lead($"event_type", 1).over(w2))
      .withColumn("e3", lead($"event_type", 2).over(w2))
      .filter($"e2".isNotNull && $"e3".isNotNull)
      .select(concat_ws(">", $"event_type", $"e2", $"e3").as("path"),
        $"user_id", $"sid")
      .groupBy($"path")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct($"user_id", $"sid").as("n_sessions"),
        countDistinct($"user_id").as("n_users"))
  }
  private[operators] val q44Sql =
    """WITH g AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |      THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |se AS (SELECT user_id, event_id, ts, event_type,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g),
      |p AS (SELECT user_id, sid, event_type,
      |    LEAD(event_type, 1) OVER w AS e2,
      |    LEAD(event_type, 2) OVER w AS e3
      |  FROM se WINDOW w AS (PARTITION BY user_id, sid ORDER BY ts, event_id))
      |SELECT event_type || '>' || e2 || '>' || e3 AS path,
      |  CAST(COUNT(*) AS BIGINT) AS n_occ,
      |  CAST(COUNT(DISTINCT (user_id, sid)) AS BIGINT) AS n_sessions,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM p WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      |GROUP BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q44_session_paths", q44, Some(q44Sql)),
    Q("q43_purchase_attribution", q43, Some(q43Sql)),
    Q("q42_error_runs", q42, Some(q42Sql)),
    Q("q41_decayed_counts", q41, Some(q41Sql)),
    Q("q40_sliding_distinct", q40, Some(q40Sql)),
    Q("q38_incremental_rollup", q38, Some(q17Sql)),
    Q("q39_rollup_retractions", q39, Some(q39Sql)),
    Q("q36_funnel", q36, Some(q36Sql)),
    Q("q37_retention", q37, Some(q37Sql)),
    Q("q32_pivot", q32, Some(q32Sql)),
    Q("q33_rolling_window", q33, Some(q33Sql)),
    Q("q29_asof_join", q29, Some(q29Sql)),
    Q("q17_events_hourly", q17, Some(q17Sql)),
    Q("q18_sessionize", q18, Some(q18Sql)),
    Q("q23_json_extract", q23, Some(q23Sql)),
    Q("q24_interval_join", q24, Some(q24Sql)),
    Q("q25_grouping_sets", q25, Some(q25Sql)))
}
