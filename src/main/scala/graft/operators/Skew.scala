package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key mitigation for the 100 TB path. AQE's skew-join handling
  * covers sort-merge joins at runtime; these helpers cover the two
  * shapes AQE cannot fix: a broadcast-infeasible join against a
  * replicable dim with a few hot keys, and a groupBy whose single
  * hottest key exceeds one task's memory.
  *
  * Salting contract: results are EXACTLY equal to the unsalted form
  * (proven in SkewSpec) — salt only changes the partitioning.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): content-hashed, so
    * retries/recomputation assign the same salt (no rand()).
    */
  private def salt(cols: Seq[Column], salts: Int): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong)).cast("int")

  /** Skew-safe equi-join: the skewed fact side gets a content-derived
    * salt; the dim side is replicated `salts` times; the join key
    * becomes (key, salt), splitting each hot key across `salts` tasks.
    * Dim replication costs |dim|·salts rows — use when |dim| is too big
    * to broadcast but far smaller than the fact table.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 1, s"salts=$salts")
    val saltedFact = fact.withColumn("_salt",
      salt(fact.columns.toIndexedSeq.map(col), salts))
    val replicatedDim = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew-safe grouped sum/count: phase 1 aggregates (key, salt) —
    * bounding any task's share of a hot key to 1/salts — phase 2 merges
    * the `salts` partials per key. Same partial+final shape Catalyst
    * uses, with an explicit extra fan-out level.
    */
  def saltedSumCount(df: DataFrame, key: String, value: String,
      salts: Int): DataFrame = {
    require(salts > 1, s"salts=$salts")
    df.withColumn("_salt", salt(df.columns.toIndexedSeq.map(col), salts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(value)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$value"),
        sum(col("_pcnt")).as("cnt"))
  }
}
