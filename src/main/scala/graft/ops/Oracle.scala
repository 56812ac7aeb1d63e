package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared helpers keeping Spark results bit-identical to the DuckDB oracle.
  *
  * Floating-point SUM/AVG over doubles is order-dependent (IEEE addition is
  * non-associative), and Spark's partial aggregation order differs from
  * DuckDB's sequential scan. We therefore aggregate through DECIMAL(28,6)
  * (exact, associative, overflow-safe at sf0.1 magnitudes) and cast the final
  * value back to DOUBLE: the same exact decimal renders to the same double in
  * both engines. Per-row double arithmetic (no reduction) is bit-exact across
  * engines as long as the expression tree shape matches, so it needs no cast.
  */
object Oracle {
  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast(DoubleType)

  /** Exact average of a double column, returned as double. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast(DoubleType) / count(lit(1))

  /** The oracle-side spelling of [[dsum]]. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,6))) AS DOUBLE)"

  /** The oracle-side spelling of [[davg]]. */
  def sqlAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,6))) AS DOUBLE) / count(*)"
}
