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

  /** Mean from an exact sum: identical to `CAST(SUM(DECIMAL) AS DOUBLE)/COUNT`. */
  def avg2(c: Column): Column = sum2(c) / count(c)

  /** Sample variance from exact moments: (q - s*s/n) / (n-1).
    * Matches BigQuery `STDDEV` and python `statistics.stdev` (sample form,
    * reference `monitoring/detectors/revenue_detector.py:131`). */
  def varianceFrom(s: Column, q: Column, n: Column): Column =
    (q - s * s / n) / (n - lit(1))

  def stddevFrom(s: Column, q: Column, n: Column): Column =
    sqrt(varianceFrom(s, q, n))
}
