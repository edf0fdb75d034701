package graft.collectives

import scala.reflect.ClassTag

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

/** MPI-style collectives re-expressed on Spark (reference C1–C3:
  * collectives/Reduce.java:22-70, collectives/AllReduce.java:20-84,
  * the withBroadcastSet pattern everywhere).
  *
  * The reference funnels the reduction through one task
  * (groupBy(0).reduceGroup); here `treeReduce` does a partial combine
  * per partition and a log-depth merge, so no single task sees all p
  * payloads — the shape that survives p=1000 executors.
  */
object Collectives {

  /** C1 Reduce: associative merge of all elements to the driver. */
  def reduce[T: ClassTag](ds: Dataset[T], op: (T, T) => T,
      depth: Int = 2): T =
    ds.rdd.treeReduce(op, depth)

  /** C2 AllReduce: reduce to the driver, re-broadcast to every
    * executor — Spark's natural allreduce (reduce + broadcast is one
    * round-trip; the reference does the same via withBroadcastSet).
    * Returns the broadcast handle; callers `.value` it inside tasks.
    */
  def allReduce[T: ClassTag](spark: SparkSession, ds: Dataset[T],
      op: (T, T) => T, depth: Int = 2): Broadcast[T] =
    spark.sparkContext.broadcast(reduce(ds, op, depth))

  /** Elementwise vector sum — the reference's CollectiveData payload
    * merge (collectives/Collective.java), N12 add with the intended
    * accumulate semantics (Point2.add's overwrite bug not replicated;
    * SURVEY §7.4 risk 4).
    */
  def vectorSum(a: Array[Double], b: Array[Double]): Array[Double] = {
    require(a.length == b.length)
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
    out
  }

  /** Elementwise scale by 1/s — the divide half of the reference's
    * add/divide averaging (N12, Point2.divide), used after a sum
    * reduction to turn totals into means. */
  def vectorDivide(a: Array[Double], s: Double): Array[Double] = {
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) / s; i += 1 }
    out
  }
}
