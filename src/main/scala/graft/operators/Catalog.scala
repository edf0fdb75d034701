package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark DataFrame builder plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness
  * oracle. Queries without SQL get a weaker rows-only check.
  *
  * Determinism contract for oracle-backed queries: every output value
  * must be bit-identical between Spark and DuckDB. Money/ratio sums go
  * through DECIMAL(18,2) (exact, order-independent) and are cast back to
  * DOUBLE at the end; purely per-row double arithmetic is IEEE-identical
  * in both engines; anything order-dependent (float fold over arrays) is
  * rounded to 6 decimals on both sides.
  *
  * `planFn` marks a query as EAGER: its `fn` materializes under scoped
  * confs at construction time (q35 — runtime bloom filters exist only
  * while its session confs are set), so the registered DataFrame is a
  * LocalTableScan of the result rows, not the real DAG. Plan consumers
  * (PlanAudit, plan-shape specs, any future schema/plan walk) must use
  * `Catalog.auditPlan`, which dispatches to `planFn` when present —
  * auditing an eager query's registered frame sees pre-materialized
  * rows and audits nothing. Timing consumers are unaffected: the
  * eager work runs inside the timed `fn` invocation.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String],
    planFn: Option[(SparkSession, String) =>
      org.apache.spark.sql.execution.SparkPlan] = None)

object Catalog {
  def all: Seq[Q] =
    RelationalQueries.all ++ EventQueries.all ++ TextQueries.all ++
      VectorQueries.all ++ MlQueries.all ++ MatrixQueries.all ++
      DamdsQueries.all ++ DamdsOracleQueries.all ++ CollectiveQueries.all ++
      MultimodalQueries.all ++ StreamingQueries.all ++ SourceQueries.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.sql.map(q.name -> _)).toMap

  private lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  /** The physical plan a plan consumer should audit for `name`: the
    * eager-query hook when registered, else the registered frame's own
    * executed plan. Every plan/schema walk goes through here so a new
    * eager query can't silently hand its local-rows plan to an audit.
    */
  def auditPlan(s: SparkSession, dir: String, name: String)
      : org.apache.spark.sql.execution.SparkPlan = {
    val q = byName(name)
    q.planFn match {
      case Some(p) => p(s, dir)
      case None => q.fn(s, dir).queryExecution.executedPlan
    }
  }
}
