package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Order-insensitive 1-row digest of a query's FULL output — the
  * second-scale gate for golden-pinned queries whose sf0.1 output is
  * too large for a VALUES literal (VERDICT r18 next 2: d07's sf0.1
  * output is 139k rows; the x-family's is 5k rows per query).
  *
  * Shape: (n_rows, xor_a, xor_b) where xor_a/xor_b are bitwise-XOR
  * folds of two independently-seeded xxhash64 values of each row's
  * canonical string. XOR is commutative/associative and overflow-free,
  * so the digest is exactly partition- and order-invariant (the
  * pinning premise), and ANY change to any row — value, count,
  * duplication — flips it with overwhelming probability (two
  * independent 64-bit folds; a single xor could in principle be
  * cancelled by a crafted pair). Canonical row string: every column
  * cast to string in schema order, doubles/floats snapped to 6dp first
  * (floor(x*1e6+0.5)/1e6, the cross-engine exactness discipline —
  * though only Spark ever computes the digest: the oracle side is a
  * pinned 1-row VALUES per scale), nulls marked with a sentinel so a
  * null column can never collide with an empty string, fields joined
  * with U+0001 so no concatenation ambiguity exists.
  *
  * Non-circularity: the digest gates DRIFT at the second scale; the
  * full per-row output stays independently gated by the driver's
  * DuckDB compare at sf0.01, and the underlying queries' algorithm
  * checks (md5 twins, out-of-JVM codec reimplementations,
  * GoldenSweepSpec's partition-invariance leg at sf0.1) are unchanged.
  * Scale shape: one extra map + a 3-column global agg over the
  * query's own output — partial-aggregated, no new shuffle of note.
  */
object DigestGate {
  def digest(df: DataFrame): DataFrame = {
    val parts: Seq[Column] = df.schema.fields.toSeq.map { f =>
      val c = f.dataType match {
        case DoubleType | FloatType =>
          (floor(col(f.name).cast("double") * 1e6 + lit(0.5)) / 1e6)
            .cast("string")
        case _ => col(f.name).cast("string")
      }
      coalesce(c, lit("\u0002null"))
    }
    val rowStr = concat_ws("\u0001", parts: _*)
    df.select(xxhash64(rowStr).as("h_a"), xxhash64(rowStr, lit(1)).as("h_b"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(h_a)").as("xor_a"),
        expr("bit_xor(h_b)").as("xor_b"))
  }
}
