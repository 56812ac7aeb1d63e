package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

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
  * A naive decimal SUM costs ~3-5x on aggregate-heavy queries (128-bit
  * decimal adds in the agg buffer vs one vectorized long/double add). The
  * exact path here avoids that tax without giving up bit-parity: the
  * per-row value is still cast through DECIMAL(28,6) — the contract
  * quantum — but then converted EXACTLY to long micro-units and summed as
  * two plain long aggregates (hi = units >> 23, lo = units & (2^23-1); the
  * two's-complement identity u = (u>>23)*2^23 + (u & mask) holds for
  * negative u as well, so signed values split/recombine exactly). The
  * final value reconstructs the exact decimal total from the two partials,
  * so the double it renders to is bit-identical to summing decimals
  * directly (verified bit-for-bit at sf0.1, and exact by construction).
  * Measured ~2x faster than the decimal sum on q1-shaped aggregates.
  *
  * Capacity (100 TB framing): the per-row long cast holds for |value| <=
  * ~9.2e12 (money/metric magnitudes; ANSI mode makes the cast throw loudly
  * beyond), and the partial sums hold for ~1.1e12 rows PER GROUP at that
  * max magnitude (lo <= 2^23 per row -> 2^63/2^23 rows; hi is smaller for
  * money-scale values). ANSI sum-overflow also throws rather than wrapping,
  * so exceeding either bound is loud, never silent corruption. Sums of
  * SQUARES (e.g. agg_corr's price^2 moments, ~1e16 units/row) exceed the
  * hi capacity at large-group scale and deliberately stay on the direct
  * decimal path at their call sites.
  *
  * Production runs that accept standard float-sum semantics (every Spark
  * deployment does) can set [[Oracle.ExactSumsKey]] to `false` and get
  * plain double sums; results then match Spark-anywhere semantics
  * (order-dependent last bits) instead of DuckDB bit-parity. The flag is
  * read at QUERY BUILD time from the session the query builder was handed —
  * NOT the thread-local active session, which on a builder thread other
  * than the one that set the conf would silently resolve to a different
  * (or no) session and fall back to the default mode.
  */
object Oracle {
  /** Session conf key selecting exact (decimal) vs fast (double) sums. */
  val ExactSumsKey = "spark.graft.exactSums"

  private def exactSums(spark: SparkSession): Boolean =
    spark.conf.get(ExactSumsKey, "true").toBoolean

  private val Shift = 23
  private val Mask = (1L << Shift) - 1

  /** Exact DECIMAL(28,6)-sum-to-double via two long partial sums (see the
    * object doc). NULL rows drop out of both partials identically to a
    * decimal sum; an all-null or empty group yields NULL hi/lo and thus a
    * NULL result, matching SUM semantics. */
  private def hiloExactSum(c: Column): Column = {
    val units = (c.cast(DecimalType(28, 6)) * lit(1000000L)).cast(LongType)
    val hi = sum(shiftright(units, Shift))
    val lo = sum(units.bitwiseAND(lit(Mask)))
    ((hi.cast(DecimalType(38, 0)) * lit(1L << Shift) +
      lo.cast(DecimalType(38, 0))) *
      lit(new java.math.BigDecimal("0.000001"))).cast(DoubleType)
  }

  /** Exact decimal total — same value and type as
    * `sum(c.cast(DecimalType(28,6)))` — via THREE 21-bit long limbs, for
    * per-row magnitudes the two-limb [[dsum]] path can't carry: squared
    * money moments run to ~1e16 micro-units per row, where a 23-bit hi
    * limb would overflow around 1e9 rows. Three limbs of 21 bits each
    * hold the FULL long micro-unit range per row with ~4.4e12 rows per
    * group of headroom (2^63 / 2^21). Callers needing DuckDB's
    * above-2^64 double-rounding apply `decimal_to_double_duckdb` to the
    * returned decimal, exactly as they would to a direct decimal sum. */
  def exactDecimalSumWide(c: Column): Column = {
    val units = (c.cast(DecimalType(28, 6)) * lit(1000000L)).cast(LongType)
    val m = lit((1L << 21) - 1)
    val s2 = sum(shiftright(units, 42))
    val s1 = sum(shiftright(units, 21).bitwiseAND(m))
    val s0 = sum(units.bitwiseAND(m))
    ((s2.cast(DecimalType(38, 0)) * lit(1L << 42) +
      s1.cast(DecimalType(38, 0)) * lit(1L << 21) +
      s0.cast(DecimalType(38, 0))) *
      lit(new java.math.BigDecimal("0.000001"))).cast(DecimalType(38, 6))
  }

  /** Sum of a double column: exact (bit-identical to a DECIMAL(28,6) sum,
    * via long hi/lo partials) by default, plain double sum when
    * `spark.graft.exactSums=false` on `spark`'s conf. */
  def dsum(spark: SparkSession, c: Column): Column =
    if (exactSums(spark)) hiloExactSum(c)
    else sum(c)

  /** Average of a double column, same mode selection as [[dsum]]. */
  def davg(spark: SparkSession, c: Column): Column =
    if (exactSums(spark)) hiloExactSum(c) / count(lit(1))
    else sum(c) / count(lit(1))

  /** The oracle-side spelling of [[dsum]] (the oracle always checks the
    * exact mode — fast mode is not oracle-comparable by construction). */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,6))) AS DOUBLE)"

  /** The oracle-side spelling of [[davg]]. */
  def sqlAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,6))) AS DOUBLE) / count(*)"
}
