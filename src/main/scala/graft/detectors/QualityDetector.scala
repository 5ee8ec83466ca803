package graft.detectors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Clock
import graft.ops.{Profiles, Thresholds, TimeFilters}

/** Data-quality degradation detection (reference
  * `monitoring/detectors/quality_detector.py`): today's per-column null
  * rates vs a 30-day baseline (SURVEY §2.4 A12, §2.3 J4 two-scalar cross)
  * plus duplicate-id rate (A10). One aggregate per side regardless of
  * column count.
  *
  * API parity: `check_quality_degradation()` → [[checkQualityDegradation]].
  */
final class QualityDetector(
    facts: DataFrame, clock: Clock,
    columns: Seq[String] = Seq("customer_id", "region"),
    idCol: String = "transaction_id", tsCol: String = "transaction_date",
    baselineDays: Int = 30, degradationPts: Double = 1.0, dupPctThreshold: Double = 0.5) {

  /** Degraded-column-count ladder (quality_detector.py:225-238 shape). */
  private val ladder = Thresholds(critical = 3, high = 2, medium = 1)

  def checkQualityDegradation(): QualityStatus = {
    val today = TimeFilters.filterOnDate(facts, tsCol, clock.today)
    val baseline = TimeFilters.filterDateBetween(facts, tsCol,
      clock.today.minusDays(baselineDays.toLong), clock.today.minusDays(1))

    def pcts(df: DataFrame): Map[String, Double] = {
      val r = Profiles.nullPcts(df, columns).head()
      columns.zipWithIndex.map { case (c, i) =>
        c -> (if (r.isNullAt(i + 1)) 0.0 else r.getDouble(i + 1))
      }.toMap
    }
    val todayPcts = pcts(today)
    val basePcts = pcts(baseline)
    val degraded = columns.filter(c => todayPcts(c) - basePcts(c) > degradationPts)

    val dupRow = Profiles.dupStats(today, idCol).head()
    val dupPct = if (dupRow.getLong(0) == 0) 0.0 else dupRow.getDouble(3)
    val issues = degraded.size + (if (dupPct > dupPctThreshold) 1 else 0)

    QualityStatus(todayPcts, dupPct, degraded,
      hasDegradation = issues > 0, severity = ladder.severity(issues.toDouble))
  }
}
