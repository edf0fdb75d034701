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
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

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
}
