package graft.detectors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Clock
import graft.ops.{Exact, Thresholds, TimeFilters}

/** Transaction-volume anomaly detection (reference
  * `monitoring/detectors/transaction_detector.py`): current-window volume vs
  * a same-hour-of-day 30-day baseline (SURVEY §2.5 W3/W6).
  *
  * API parity: `check_transaction_volume(hours)` →
  * [[checkTransactionVolume]]. Guards replicated: avg==0 → deviation 0
  * (`:45`), min-sample n<7 (`:130`).
  */
final class TransactionDetector(
    txns: DataFrame, clock: Clock,
    tsCol: String = "transaction_date",
    baselineDays: Int = 30, minSamples: Int = 7, zThreshold: Double = 2.5) {

  def checkTransactionVolume(hours: Int = 1): VolumeStatus = {
    val currentCount = txns
      .filter(TimeFilters.trailing(col(tsCol), clock.now, hours = hours))
      .count()
    val currentHour = clock.now.atZone(java.time.ZoneOffset.UTC).getHour

    // per-day counts at the same hour over the trailing baseline window,
    // EXCLUDING the current check window (transaction_detector.py:113
    // `transaction_date < TIMESTAMP_SUB(now, INTERVAL {hours} HOUR)`) so a
    // currently-anomalous hour cannot dampen its own z-score
    val baselineEnd = clock.now.minusSeconds(hours.toLong * 3600)
    val perDay = txns
      .filter(TimeFilters.trailing(col(tsCol), clock.now, days = baselineDays))
      .filter(col(tsCol) < lit(java.sql.Timestamp.from(baselineEnd)))
      .filter(hour(col(tsCol)) === currentHour)
      .groupBy(to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("cnt"))
    val m = perDay.agg(
        sum(col("cnt")).cast("double"), sum(col("cnt") * col("cnt")).cast("double"),
        count(lit(1)), min(col("cnt")).cast("double"), max(col("cnt")).cast("double"),
        expr("percentile(cnt, 0.5)"))
      .head()
    val n = m.getLong(2)

    if (n < minSamples) {
      VolumeStatus(currentHour, currentCount, None, 0.0, isAnomaly = false, 0.0, "NONE")
    } else {
      val s = m.getDouble(0); val q = m.getDouble(1)
      val avg = s / n
      val variance = (q - s * s / n) / (n - 1)
      val std = math.sqrt(math.max(0.0, variance))
      val z = if (std > 0) (currentCount - avg) / std else 0.0
      val deviationPct = if (avg > 0) (currentCount - avg) / avg * 100 else 0.0
      val isAnomaly = math.abs(z) > zThreshold
      val severity =
        if (isAnomaly) Thresholds.TxnDeviation.severity(math.abs(deviationPct)) else "NONE"
      // real percentile(0.5) in the median slot — filling it with the avg
      // would hand consumers a fabricated statistic on skewed distributions
      VolumeStatus(currentHour, currentCount,
        Some(Baseline(avg, std, m.getDouble(5), m.getDouble(3), m.getDouble(4), n)),
        z, isAnomaly, deviationPct, severity)
    }
  }

  /** Hourly volume breakdown over a trailing window (transaction_detector.py:142-155). */
  def hourlyBreakdown(hours: Int = 24): DataFrame =
    txns
      .filter(TimeFilters.trailing(col(tsCol), clock.now, hours = hours))
      .groupBy(hour(col(tsCol)).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("hour"))
}
