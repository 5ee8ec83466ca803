package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic ("exact") numeric aggregates over double columns.
  *
  * Plain `sum(double)` is order-dependent (floating-point addition is not
  * associative), so at 32-way — or 1000-executor — parallelism two runs of the
  * same query can differ in the last few ulps, and an engine-vs-oracle hash
  * compare would flake. Routing the sum through a fixed-scale decimal makes it
  * exact and therefore bitwise-reproducible at ANY parallelism — this is the
  * same trick as money-typed columns in ledger systems and costs one codegen
  * cast on the map side (no extra shuffle; partial aggregation still applies).
  *
  * Derived moments (avg, stddev, z-score) are then computed from the exact
  * sums with an explicit double formula, so engine and oracle evaluate the
  * identical IEEE expression tree.
  *
  * Precision envelope: the decimal sums are always exact, but once a sum
  * exceeds 2^53 in units of its scale (e.g. sum-of-squares of ~1e6-scale
  * values), the final decimal->double conversion rounds, and the moments
  * cancellation can leave an absolute error ~sqrt(q*eps) in stddev. Cross-
  * engine parity still holds to ±1 ulp (identical formula; outputs that
  * matter are rounded at fixed decimals), and [[varianceFrom]] clamps the
  * epsilon-negative case that would otherwise sqrt to NaN.
  */
object Exact {

  /** Exact sum of a double column quantized to `scale` decimals, as double. */
  def sumD(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact sum of a double column (2 decimal digits, money-scale), as double. */
  def sum2(c: Column): Column = sumD(c, 2)

  /** Exact sum at 6 decimals (small-magnitude metric columns). */
  def sum6(c: Column): Column = sumD(c, 6)

  /** Exact sum of squares (inputs quantized to 2 decimals), as double. */
  def sumSq2(c: Column): Column = {
    val d = c.cast(DecimalType(18, 2))
    sum(d * d).cast("double")
  }

  /** Mean from an exact sum: identical to `CAST(SUM(DECIMAL) AS DOUBLE)/COUNT`
    * wherever any value exists; NULL (not an ANSI DIVIDE_BY_ZERO abort) on an
    * all-null/empty input — see [[varianceFrom]] for why the guard exists. */
  def avg2(c: Column): Column =
    when(count(c) > 0, sum2(c) / count(c))

  /** Sample variance from exact moments: (q - s*s/n) / (n-1), clamped at 0 —
    * for (near-)constant series the two big terms cancel and double rounding
    * can leave an epsilon-negative value whose sqrt would be NaN.
    * Matches BigQuery `STDDEV` and python `statistics.stdev` (sample form,
    * reference `monitoring/detectors/revenue_detector.py:131`).
    *
    * n <= 1 yields NULL by an explicit branch. It MUST: Spark 4.1's ANSI
    * mode raises DIVIDE_BY_ZERO for DOUBLE division too (verified: both
    * `0.0d / 0L` and `0.0d / 0.0d` throw SparkArithmeticException — an
    * earlier note here claiming the error was integral/decimal-only was
    * wrong for this Spark version), so the unguarded n=1 case didn't
    * produce NaN, it ABORTED the whole job the first time a baseline had a
    * single sample. CaseWhen evaluates only the matched branch, so the
    * divide never executes when n <= 1. For n >= 2 the expression tree and
    * values are unchanged (oracle parity intact — no green oracle row can
    * have n <= 1, since that case previously crashed the engine side).
    * Callers that want a stronger defined-baseline contract still gate on
    * sample size (q22/q40's n >= 7). */
  def varianceFrom(s: Column, q: Column, n: Column): Column =
    when(n > lit(1), greatest((q - s * s / n) / (n - lit(1)), lit(0.0)))

  def stddevFrom(s: Column, q: Column, n: Column): Column =
    sqrt(varianceFrom(s, q, n))
}
