package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
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
  *
  * The decimal path costs ~3-5x on aggregate-heavy queries (128-bit decimal
  * adds vs one vectorized double add). That price buys CROSS-ENGINE
  * bit-parity — a contract only the oracle gate needs. Production runs that
  * accept standard float-sum semantics (every Spark deployment does) can set
  * [[Oracle.ExactSumsKey]] to `false` and get plain double sums; results
  * then match Spark-anywhere semantics (order-dependent last bits) instead
  * of DuckDB bit-parity. The flag is read at QUERY BUILD time from the
  * session the query builder was handed — NOT the thread-local active
  * session, which on a builder thread other than the one that set the conf
  * would silently resolve to a different (or no) session and fall back to
  * the default mode.
  */
object Oracle {
  /** Session conf key selecting exact (decimal) vs fast (double) sums. */
  val ExactSumsKey = "spark.graft.exactSums"

  private def exactSums(spark: SparkSession): Boolean =
    spark.conf.get(ExactSumsKey, "true").toBoolean

  /** Sum of a double column: exact via DECIMAL(28,6) by default, plain
    * double sum when `spark.graft.exactSums=false` on `spark`'s conf. */
  def dsum(spark: SparkSession, c: Column): Column =
    if (exactSums(spark)) sum(c.cast(DecimalType(28, 6))).cast(DoubleType)
    else sum(c)

  /** Average of a double column, same mode selection as [[dsum]]. */
  def davg(spark: SparkSession, c: Column): Column =
    if (exactSums(spark))
      sum(c.cast(DecimalType(28, 6))).cast(DoubleType) / count(lit(1))
    else sum(c) / count(lit(1))

  /** The oracle-side spelling of [[dsum]] (the oracle always checks the
    * exact mode — fast mode is not oracle-comparable by construction). */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,6))) AS DOUBLE)"

  /** The oracle-side spelling of [[davg]]. */
  def sqlAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,6))) AS DOUBLE) / count(*)"
}
