package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** The relational operator surface (SURVEY.md §2.2–§2.4, §2.7 where
  * SQL-expressible) exercised over the TPC-H-ish fixtures.
  *
  * Operator coverage ↔ reference mapping (citations into /root/reference):
  *  - scan/project/filter: P1/P4/P5 (e.g. kmeans/KMeansOriginal.java:83-93)
  *  - equi join: J1 (damds/Distances.java:46-69)
  *  - broadcast join: J3 (mm/MatrixMultiply.java:113-135)
  *  - global reduce: A1 (damds/Statistics.java:20-26)
  *  - groupBy agg, partial+final: A2/A3 (kmeans/KMeansBlock.java:46-99)
  *  - ordered gather: A4 (damds/CG.java:289-331)
  *  - DoubleStatistics: A6 (damds/Statistics.java:30-47)
  *  - row-wise weight sums (VArray): A8 (damds/VArray.java:49-67)
  *  - argmin / nearest centroid: N6 (kmeans/KMeansBlock.java:166-178)
  *  - fixed-point decode + floor repair: N7/N8 (damds/DAMDSUtils.java:8-9,
  *    damds/Distances.java:162-171)
  *  - relational GEMM: N1 (mm/Utils.java:16-35) as (row,col,val) algebra
  * plus the Spark-native extensions (windows, set ops, rollup, semi/anti
  * joins) the reference lacks (§2.9) but the engine declares.
  */
object RelationalQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private val one = lit(1).cast(DecimalType(18, 2))

  // ---- q01: TPC-H Q1-style pricing summary (A2/A3 partial+final agg) ----
  private def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("2001-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (one - dec($"l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec($"l_extendedprice") * (one - dec($"l_discount")) *
          (one + dec($"l_tax"))).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
  }
  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---- q02: filter + projection (P1/P3; pushdown-friendly) ----
  private def q02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .filter($"l_quantity" >= 45.0 && $"l_discount" >= 0.07)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_extendedprice")
  }
  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_quantity >= 45.0 AND l_discount >= 0.07""".stripMargin

  // ---- q03: 3-way equi join + grouped revenue (J1 + A2) ----
  private def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    val l = Tables(s, dir, "lineitem")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec($"l_extendedprice") * (one - dec($"l_discount")))
          .cast("double").as("revenue"))
  }
  private val q03Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  // ---- q04: star join through broadcast dims (J3) ----
  private def q04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables(s, dir, "lineitem")
    val su = Tables(s, dir, "supplier")
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    l.join(broadcast(su), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec($"l_extendedprice") * (one - dec($"l_discount")))
          .cast("double").as("revenue"))
  }
  private val q04Sql =
    """SELECT r_name, n_name, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  // ---- q05: semi join (EXISTS) ----
  private def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables(s, dir, "orders")
    val big = Tables(s, dir, "lineitem").filter($"l_extendedprice" > 90000.0)
    o.join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }
  private val q05Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_extendedprice > 90000.0)
      |GROUP BY o_orderpriority""".stripMargin

  // ---- q06: anti join (NOT EXISTS) ----
  private def q06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
  }
  private val q06Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment""".stripMargin

  // ---- q07: left outer join with null accounting ----
  private def q07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables(s, dir, "orders")
    val l = Tables(s, dir, "lineitem").filter($"l_quantity" >= 49.0)
    o.join(l, $"o_orderkey" === $"l_orderkey", "left_outer")
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when($"l_orderkey".isNull, 1L).otherwise(0L)).as("n_unmatched"))
  }
  private val q07Sql =
    """SELECT o_orderstatus, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
      |FROM orders LEFT JOIN (
      |  SELECT * FROM lineitem WHERE l_quantity >= 49.0) l
      |ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus""".stripMargin

  // ---- q08: global reduce (A1) ----
  private def q08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem").agg(
      count(lit(1)).as("n"),
      countDistinct($"l_orderkey").as("n_orders"),
      sum($"l_quantity").cast("double").as("total_qty"),
      min($"l_extendedprice").cast("double").as("min_price"),
      max($"l_extendedprice").cast("double").as("max_price"))
  }
  private val q08Sql =
    """SELECT COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS n_orders,
      |  CAST(SUM(l_quantity) AS DOUBLE) AS total_qty,
      |  CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
      |  CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
      |FROM lineitem""".stripMargin

  // ---- q09: DoubleStatistics (A6): count/min/max/sum/sumsq/positiveMin --
  private def q09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem").agg(
      count($"l_discount").as("cnt"),
      min($"l_discount").cast("double").as("vmin"),
      max($"l_discount").cast("double").as("vmax"),
      sum(dec($"l_discount")).cast("double").as("vsum"),
      sum(dec($"l_discount") * dec($"l_discount")).cast("double")
        .as("vsumsq"),
      min(when($"l_discount" > 0.0, $"l_discount")).cast("double")
        .as("positive_min"))
  }
  private[operators] val q09Sql =
    """SELECT COUNT(l_discount) AS cnt,
      |  CAST(MIN(l_discount) AS DOUBLE) AS vmin,
      |  CAST(MAX(l_discount) AS DOUBLE) AS vmax,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS vsumsq,
      |  CAST(MIN(CASE WHEN l_discount > 0.0 THEN l_discount END) AS DOUBLE) AS positive_min
      |FROM lineitem""".stripMargin

  // ---- q10: top-k with deterministic tiebreak ----
  private def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }
  private val q10Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ---- q11: per-group argmin (N6) via min_by hash agg ----
  // (a window over the 3-value l_returnflag key would sort the whole
  // table in ≤3 tasks; min_by with a unique-ordering struct is one
  // hash-agg pass with map-side partials and a deterministic tiebreak)
  private def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(min_by(
        struct($"l_orderkey", $"l_linenumber", $"l_extendedprice"),
        struct($"l_extendedprice", $"l_orderkey", $"l_linenumber")).as("m"))
      .select($"l_returnflag", $"m.l_orderkey".as("l_orderkey"),
        $"m.l_linenumber".as("l_linenumber"),
        $"m.l_extendedprice".as("min_price"))
  }
  private val q11Sql =
    """SELECT l_returnflag, l_orderkey, l_linenumber,
      |  l_extendedprice AS min_price
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |        ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
      |      FROM lineitem) t
      |WHERE rn = 1""".stripMargin

  // ---- q12: ranking + running sum window ----
  private def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"s_nationkey")
      .orderBy($"s_acctbal".desc, $"s_suppkey".asc)
    Tables(s, dir, "supplier")
      .select($"s_nationkey", $"s_suppkey", $"s_acctbal",
        row_number().over(w).cast("long").as("rnk"),
        sum(dec($"s_acctbal")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_bal"))
  }
  private val q12Sql =
    """SELECT s_nationkey, s_suppkey, s_acctbal,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_bal
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)""".stripMargin

  // ---- q13: ordered gather (A4) — index-ordered reassembly per key ----
  private def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(
        concat_ws(",",
          transform(array_sort(collect_list($"l_linenumber")),
            c => c.cast("string"))).as("lines"),
        count(lit(1)).as("n_lines"))
  }
  private val q13Sql =
    """SELECT l_orderkey,
      |  string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines,
      |  COUNT(*) AS n_lines
      |FROM lineitem GROUP BY l_orderkey""".stripMargin

  // ---- q14: distinct aggregation ----
  private def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"))
  }
  private val q14Sql =
    """SELECT l_returnflag, l_linestatus,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---- q15: set operations ----
  private def q15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withOrders = Tables(s, dir, "orders").select($"o_custkey".as("k")).distinct()
    val rich = Tables(s, dir, "customer").filter($"c_acctbal" > 5000.0)
      .select($"c_custkey".as("k")).distinct()
    def cnt(op: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), $"n")
    cnt("intersect", withOrders.intersect(rich))
      .unionAll(cnt("except", withOrders.except(rich)))
      .unionAll(cnt("union", withOrders.union(rich).distinct()))
  }
  private val q15Sql =
    """WITH wo AS (SELECT DISTINCT o_custkey AS k FROM orders),
      |     rich AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0)
      |SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT k FROM wo INTERSECT SELECT k FROM rich) t
      |UNION ALL
      |SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT k FROM wo EXCEPT SELECT k FROM rich) t
      |UNION ALL
      |SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT k FROM wo UNION SELECT k FROM rich) t""".stripMargin

  // ---- q16: rollup (grouping sets) ----
  private def q16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").cast("double").as("qty"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"),
        $"n", $"qty")
  }
  private val q16Sql =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |  COALESCE(l_linestatus, 'ALL') AS ls,
      |  COUNT(*) AS n, CAST(SUM(l_quantity) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  // ---- q19: fixed-point decode (N7) + distance floor repair (N8) ----
  private def q19(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val decoded = ($"l_partkey" % 32768).cast("smallint").cast("double") / 32767.0
    Tables(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", decoded.as("decoded"))
      .withColumn("repaired",
        when($"decoded" >= 0.0 && $"decoded" < 0.001, 0.001)
          .otherwise($"decoded"))
  }
  private val q19Sql =
    """SELECT l_orderkey, l_linenumber, decoded,
      |  CASE WHEN decoded >= 0.0 AND decoded < 0.001 THEN 0.001 ELSE decoded END AS repaired
      |FROM (SELECT l_orderkey, l_linenumber,
      |        CAST(CAST(l_partkey % 32768 AS SMALLINT) AS DOUBLE) / 32767.0 AS decoded
      |      FROM lineitem) t""".stripMargin

  // ---- q20: relational GEMM (N1) over (row, col, value) algebra ----
  private def q20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = Tables(s, dir, "lineitem")
      .groupBy(($"l_orderkey" % 8).as("i"), ($"l_partkey" % 8).as("k"))
      .agg(sum($"l_quantity").cast("double").as("v"))
    val b = Tables(s, dir, "part")
      .groupBy(($"p_partkey" % 8).as("k"), ($"p_size" % 8).cast("long").as("j"))
      .agg(count(lit(1)).cast("double").as("w"))
    a.join(broadcast(b), "k")
      .groupBy($"i", $"j")
      .agg(sum($"v" * $"w").as("c"))
  }
  private val q20Sql =
    """WITH a AS (SELECT l_orderkey % 8 AS i, l_partkey % 8 AS k,
      |             CAST(SUM(l_quantity) AS DOUBLE) AS v
      |           FROM lineitem GROUP BY 1, 2),
      |     b AS (SELECT p_partkey % 8 AS k, CAST(p_size % 8 AS BIGINT) AS j,
      |             CAST(COUNT(*) AS DOUBLE) AS w
      |           FROM part GROUP BY 1, 2)
      |SELECT i, j, SUM(a.v * b.w) AS c
      |FROM a JOIN b USING (k) GROUP BY i, j""".stripMargin

  // ---- q21: nearest-centroid assignment (N6 + N5, one K-Means step) ----
  private def q21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = Tables(s, dir, "customer")
      .select($"c_custkey".as("id"), $"c_acctbal".as("x"),
        ($"c_custkey" % 97).cast("double").as("y"))
    val cents = Seq((0, 0.0, 0.0), (1, 2500.0, 25.0), (2, 5000.0, 50.0),
      (3, 7500.0, 75.0)).toDF("cid", "cx", "cy")
    val d = pts.crossJoin(broadcast(cents))
      .withColumn("dist2",
        ($"x" - $"cx") * ($"x" - $"cx") + ($"y" - $"cy") * ($"y" - $"cy"))
    // argmin via min_by hash agg (no window shuffle+sort over N×k rows)
    d.groupBy($"id")
      .agg(min_by(struct($"cid", $"dist2"), struct($"dist2", $"cid")).as("m"))
      .select($"id", $"m.cid".as("cid"), $"m.dist2".as("dist2"))
  }
  private val q21Sql =
    """WITH pts AS (SELECT c_custkey AS id, c_acctbal AS x,
      |               CAST(c_custkey % 97 AS DOUBLE) AS y FROM customer),
      |     cents AS (SELECT * FROM (VALUES (0, 0.0, 0.0), (1, 2500.0, 25.0),
      |               (2, 5000.0, 50.0), (3, 7500.0, 75.0)) t(cid, cx, cy)),
      |     d AS (SELECT id, cid,
      |             (x - cx) * (x - cx) + (y - cy) * (y - cy) AS dist2
      |           FROM pts CROSS JOIN cents),
      |     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
      |             ORDER BY dist2, cid) AS rn FROM d)
      |SELECT id, cid, dist2 FROM r WHERE rn = 1""".stripMargin

  // ---- q22: VArray row-weight sums (A8): v[i] = 1 + Σ_j w_ij ----
  private def q22(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_suppkey".as("row_id"))
      .agg((lit(1).cast(DecimalType(18, 2)) + sum(dec($"l_discount")))
        .cast("double").as("v"))
  }
  private val q22Sql =
    """SELECT l_suppkey AS row_id,
      |  CAST(1 + SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS v
      |FROM lineitem GROUP BY l_suppkey""".stripMargin

  // ---- q26: exact interpolated percentiles per group ----
  // Spark `percentile` and DuckDB `quantile_cont` share the sorted
  // linear-interpolation definition; results are rounded to 6dp on
  // both sides to absorb the last-bit interpolation arithmetic
  private def q26(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // ONE percentile(…, array(…)) call, not four: each percentile agg
    // buffers the group's whole value set (prices are ~unique, so the
    // buffer is row-proportional) — four scalar calls built four
    // independent buffers and paid the partial/merge serialization 4×
    // (3.1 s → 1.0 s at sf0.1, values identical by construction: the
    // array form is the same Percentile aggregate evaluating the same
    // sorted buffer at four fractions)
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(expr(
        "percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.99))").as("ps"))
      .select($"l_returnflag",
        round(expr("ps[0]"), 6).as("p25"), round(expr("ps[1]"), 6).as("p50"),
        round(expr("ps[2]"), 6).as("p75"), round(expr("ps[3]"), 6).as("p99"))
  }
  private val q26Sql =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
      |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ---- q27: correlated scalar subquery via the SQL interface ----
  // parts priced above their brand's average; Catalyst decorrelates the
  // subquery into an aggregate + join (no per-row re-execution), and
  // the engine's SQL text surface gets exercised end to end
  private def q27(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "part").createOrReplaceTempView("graft_part")
    s.sql(
      """SELECT p_partkey, p_brand,
        |  CAST(p_retailprice AS DOUBLE) AS price
        |FROM graft_part p
        |WHERE p_retailprice > 1.1 * (
        |  SELECT AVG(CAST(p2.p_retailprice AS DECIMAL(18,2)))
        |  FROM graft_part p2 WHERE p2.p_brand = p.p_brand)""".stripMargin)
  }
  private val q27Sql =
    """SELECT p_partkey, p_brand, CAST(p_retailprice AS DOUBLE) AS price
      |FROM part p
      |WHERE p_retailprice > 1.1 * (
      |  SELECT AVG(CAST(p2.p_retailprice AS DECIMAL(18,2)))
      |  FROM part p2 WHERE p2.p_brand = p.p_brand)""".stripMargin

  // ---- q28: skew-salted grouped aggregation (driver-visible proof of
  // Skew.saltedSumCount) ----
  // A deliberately hot key (every l_orderkey ≡ 0 mod 3 folds into key
  // 0, ~1/3 of the table) aggregated through the two-phase salted plan;
  // the oracle is the PLAIN group-by — salting must be result-invisible.
  // Values go through DECIMAL(18,2) so sums are exact and
  // order-independent regardless of which salt partial they land in.
  private def q28(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keyed = Tables(s, dir, "lineitem")
      .select(
        when($"l_orderkey" % 3 === 0, 0L)
          .otherwise($"l_orderkey" % 64).as("k"),
        dec($"l_quantity").as("qty"))
    Skew.saltedSumCount(keyed, "k", "qty", salts = 8)
      .select($"k", $"sum_qty".cast("double").as("sum_qty"), $"cnt")
  }
  private val q28Sql =
    """SELECT CASE WHEN l_orderkey % 3 = 0 THEN 0
      |       ELSE l_orderkey % 64 END AS k,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS cnt
      |FROM lineitem GROUP BY 1""".stripMargin

  // ---- q30: bucketed co-located join (zero-shuffle at scale) ----
  // Both sides are written ONCE per dataset as bucketed+sorted tables
  // on the join key (the durable co-partitioning a recurring 100 TB
  // join pays for once); the join then needs no Exchange — Catalyst
  // proves the bucket spec satisfies the distribution requirement
  // (asserted in BucketingSpec). hint("merge") keeps the plan on the
  // bucketed SMJ path at fixture scale where broadcast would otherwise
  // hide it. Bucketing is result-invisible: the oracle is the plain
  // join+agg.
  // SessionCache (not raw TrieMap): the build thunk WRITES the
  // bucketed tables, so two racing first callers must serialize or
  // they race the same saveAsTable paths
  private val bucketedFor = new SessionCache[String, (String, String)](_ => ())

  private def q30(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (lt, ot) = bucketedFor.getOrBuild(s, dir) {
      val tag = Integer.toHexString(dir.hashCode)
      val lt = s"graft_b_lineitem_$tag"; val ot = s"graft_b_orders_$tag"
      val wh = s.conf.get("spark.sql.warehouse.dir")
      graft.sources.Bucketing.writeBucketed(
        Tables(s, dir, "lineitem").select($"l_orderkey", $"l_quantity"),
        s"$wh/$lt", lt, "l_orderkey", 16)
      graft.sources.Bucketing.writeBucketed(
        Tables(s, dir, "orders").select($"o_orderkey", $"o_orderpriority"),
        s"$wh/$ot", ot, "o_orderkey", 16)
      (lt, ot)
    }
    s.table(lt).hint("merge")
      .join(s.table(ot), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec($"l_quantity")).cast("double").as("qty"))
  }
  private val q30Sql =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  // ---- q31: sketch aggregations (HLL++ distinct, GK percentiles) ----
  // The approximate surface a 100 TB engine leans on when exact
  // distinct/percentile shuffles are too expensive: one pass, bounded
  // memory per group, mergeable partials. Rows-only for the driver
  // (sketch internals are implementation-specific, so DuckDB's approx
  // functions produce different estimates); SkewAndStatsSpec bounds the
  // relative error vs the exact answers instead.
  private def q31(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_orderkey", rsd = 0.02).as("approx_orders"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 10000)")
          .as("price_p50_p99"))
      .select($"l_returnflag", $"approx_orders",
        $"price_p50_p99"(0).as("price_p50"), $"price_p50_p99"(1).as("price_p99"))
  }

  // ---- q34: skew-salted equi-join (driver-visible proof of
  // Skew.saltedJoin) ----
  // The join-side sibling of q28: a deliberately hot join key (every
  // even l_partkey folds into key 0 — half the fact table on one key)
  // joined to a replicable dim through the salt-and-replicate plan.
  // AQE's skew handling only splits sort-merge partitions; this is the
  // shape for a broadcast-infeasible dim where a single hot key would
  // otherwise pin one task. Salting is result-invisible (SkewSpec) and
  // the oracle is the PLAIN join+agg; sums go through DECIMAL so which
  // salt a row lands on cannot move the total.
  private def q34(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fact = Tables(s, dir, "lineitem").select(
      when($"l_partkey" % 2 === 0, 0L).otherwise($"l_partkey" % 32).as("k"),
      dec($"l_quantity").as("qty"))
    val dim = Tables(s, dir, "supplier")
      .groupBy(($"s_suppkey" % 32).as("k"))
      .agg(sum(dec($"s_acctbal")).as("bal"))
    Skew.saltedJoin(fact, dim, "k", salts = 8)
      .groupBy($"k")
      .agg(sum($"qty").cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"),
        max($"bal").cast("double").as("bal"))
  }
  private val q34Sql =
    """WITH f AS (SELECT CASE WHEN l_partkey % 2 = 0 THEN 0
      |             ELSE l_partkey % 32 END AS k,
      |           CAST(l_quantity AS DECIMAL(18,2)) AS qty
      |           FROM lineitem),
      |     d AS (SELECT s_suppkey % 32 AS k,
      |             SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS bal
      |           FROM supplier GROUP BY 1)
      |SELECT f.k, CAST(SUM(f.qty) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS cnt, CAST(MAX(d.bal) AS DOUBLE) AS bal
      |FROM f JOIN d USING (k) GROUP BY 1""".stripMargin

  // ---- q35: runtime bloom-filter pruned join ----
  // The shuffle-join prefilter a 100 TB fact join lives on when the dim
  // side is too big to broadcast but carries a selective predicate:
  // Catalyst's InjectRuntimeFilter builds a bloom filter from the
  // filtered creation side and applies might_contain on the fact scan,
  // so most fact rows drop BEFORE the shuffle instead of after the
  // join. Thresholds are scoped per-query the way a production job
  // pins them (fixture scans are far below the 10GB application-side
  // default; broadcast is disabled to force the shuffle-join shape the
  // rule targets). Bloom filtering is result-invisible — the oracle is
  // the plain join+agg — and the injection itself is plan-asserted in
  // PlanDisciplineSpec.
  /** Scoped-conf runner shared by q35's two entry points: the bloom
    * thresholds + no-broadcast shape; `body` must force
    * planning/execution inside the scope. */
  private def withBloomConfs[T](s: SparkSession)(body: => T): T =
    Tables.withConfs(s, Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"))(body)

  /** The one query DAG both q35 and its plan assert run. */
  private def q35Frame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables(s, dir, "lineitem")
      .select($"l_orderkey", dec($"l_quantity").as("qty"))
    val o = Tables(s, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_orderpriority")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum($"qty").cast("double").as("sum_qty"))
  }

  private def q35(s: SparkSession, dir: String): DataFrame =
    withBloomConfs(s) {
      // eager materialization: the bloom shape is planned under the
      // scoped confs, not at the caller's later action time; the
      // collected rows are bounded (one per priority value). Schema
      // comes from the frame itself so it cannot drift from the DAG.
      val frame = q35Frame(s, dir)
      s.createDataFrame(
        s.sparkContext.parallelize(frame.collect().toIndexedSeq, 1),
        frame.schema)
    }

  /** The bloom-shaped plan itself, unexecuted (hook for
    * PlanDisciplineSpec and PlanAudit: q35's registered output plan is
    * only the collected local rows). Same DAG as q35 by construction. */
  private[graft] def q35Plan(s: SparkSession, dir: String)
      : org.apache.spark.sql.execution.SparkPlan =
    withBloomConfs(s) { q35Frame(s, dir).queryExecution.executedPlan }
  private val q35Sql =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q27_correlated_subquery", q27, Some(q27Sql)),
    Q("q28_salted_agg", q28, Some(q28Sql)),
    Q("q34_salted_join", q34, Some(q34Sql)),
    Q("q35_bloom_join", q35, Some(q35Sql), planFn = Some(q35Plan)),
    Q("q30_bucketed_join", q30, Some(q30Sql)),
    Q("q31_approx_stats", q31, Some(GoldenOracles.q31)),
    Q("q26_percentiles", q26, Some(q26Sql)),
    Q("q01_pricing_summary", q01, Some(q01Sql)),
    Q("q02_filter_project", q02, Some(q02Sql)),
    Q("q03_join_agg", q03, Some(q03Sql)),
    Q("q04_star_broadcast_join", q04, Some(q04Sql)),
    Q("q05_semi_join", q05, Some(q05Sql)),
    Q("q06_anti_join", q06, Some(q06Sql)),
    Q("q07_outer_join", q07, Some(q07Sql)),
    Q("q08_global_agg", q08, Some(q08Sql)),
    Q("q09_double_statistics", q09, Some(q09Sql)),
    Q("q10_topk", q10, Some(q10Sql)),
    Q("q11_argmin_window", q11, Some(q11Sql)),
    Q("q12_window_rank", q12, Some(q12Sql)),
    Q("q13_ordered_gather", q13, Some(q13Sql)),
    Q("q14_distinct_agg", q14, Some(q14Sql)),
    Q("q15_set_ops", q15, Some(q15Sql)),
    Q("q16_rollup", q16, Some(q16Sql)),
    Q("q19_fixed_point", q19, Some(q19Sql)),
    Q("q20_relational_gemm", q20, Some(q20Sql)),
    Q("q21_kmeans_assign", q21, Some(q21Sql)),
    Q("q22_varray_row_sums", q22, Some(q22Sql)))
}
