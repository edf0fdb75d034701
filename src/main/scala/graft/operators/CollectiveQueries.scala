package graft.operators

import graft.Tables
import graft.collectives.Collectives
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible oracle row for the collectives (C1 Reduce / C2
  * AllReduce — reference collectives/Reduce.java:22-70,
  * collectives/AllReduce.java:20-84).
  *
  * Shape mirrors the reference harness: each "worker" (a suppkey
  * bucket of lineitem) builds one payload vector (row counts per
  * part-bucket dimension), the payloads are tree-reduced with the
  * elementwise vectorSum merge (C1), the result is AllReduce-broadcast
  * (C2), and every receiving partition emits the vector it read inside
  * its task — so the output proves both the reduction value and that
  * all receivers observed the same vector.
  *
  * Payload entries are integer-valued doubles (counts), so the
  * tree-reduce merge order is FP-exact and the plain GROUP BY oracle
  * matches bit-for-bit with no rounding.
  */
object CollectiveQueries {

  private val dims = 8
  private val workers = 16
  private val receivers = 4

  private def c01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables(s, dir, "lineitem")
      .select(pmod($"l_suppkey", lit(workers)).as("w"),
        pmod($"l_partkey", lit(dims)).as("k"))
      .groupBy($"w", $"k").agg(count(lit(1)).as("c"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (_, rows) =>
        val v = new Array[Double](dims)
        rows.foreach { case (_, k, c) => v(k.toInt) += c.toDouble }
        v
      }
    val bc = Collectives.allReduce(s, payloads, Collectives.vectorSum)
    s.range(0, receivers, 1, receivers).as[Long]
      .flatMap(p => bc.value.zipWithIndex.map { case (v, k) => (p, k.toLong, v) })
      .toDF("receiver", "dim", "total")
  }
  private val c01Sql =
    s"""WITH d AS (SELECT range AS dim FROM range($dims)),
       |  g AS (SELECT l_partkey % $dims AS dim, CAST(COUNT(*) AS DOUBLE) AS total
       |        FROM lineitem GROUP BY 1),
       |  v AS (SELECT d.dim, COALESCE(g.total, 0.0) AS total
       |        FROM d LEFT JOIN g USING (dim)),
       |  r AS (SELECT range AS receiver FROM range($receivers))
       |SELECT r.receiver, v.dim, v.total FROM r CROSS JOIN v""".stripMargin

  // ---- c02: reduce + divide (N12 add/divide averaging) ----
  // The reference's add/divide pair: sum payload vectors across
  // workers, then vectorDivide by the worker count to get the per-
  // worker mean. workers = 16 is a power of two, so the division is
  // FP-exact and the GROUP BY / 16 oracle matches bit-for-bit.
  private def c02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables(s, dir, "lineitem")
      .select(pmod($"l_suppkey", lit(workers)).as("w"),
        pmod($"l_partkey", lit(dims)).as("k"))
      .groupBy($"w", $"k").agg(count(lit(1)).as("c"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (_, rows) =>
        val v = new Array[Double](dims)
        rows.foreach { case (_, k, c) => v(k.toInt) += c.toDouble }
        v
      }
    val total = Collectives.reduce(payloads, Collectives.vectorSum)
    val mean = Collectives.vectorDivide(total, workers.toDouble)
    mean.zipWithIndex.map { case (v, k) => (k.toLong, v) }
      .toSeq.toDF("dim", "mean_per_worker")
  }
  private val c02Sql =
    s"""WITH d AS (SELECT range AS dim FROM range($dims)),
       |  g AS (SELECT l_partkey % $dims AS dim,
       |          CAST(COUNT(*) AS DOUBLE) / $workers AS mean_per_worker
       |        FROM lineitem GROUP BY 1),
       |  v AS (SELECT d.dim, COALESCE(g.mean_per_worker, 0.0) AS mean_per_worker
       |        FROM d LEFT JOIN g USING (dim))
       |SELECT dim, mean_per_worker FROM v""".stripMargin

  val all: Seq[Q] = Seq(
    Q("c01_allreduce", c01, Some(c01Sql)),
    Q("c02_reduce_divide", c02, Some(c02Sql)))
}
