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

    // TWO actions, not three: today's null profile and its duplicate
    // stats combine into ONE aggregate (they were two separate jobs each
    // re-scanning the same today slice — the serial-driver-loop shape
    // FreshnessDetector's union already optimized away). The baseline
    // profile stays its own job: folding it in via a side-tagged union
    // would drag the countDistinct shuffle across 30 days of data for a
    // statistic only today needs.
    val n = count(lit(1))
    val nullAggs = columns.map(c =>
      when(n > 0, Profiles.countIf(col(c).isNull) * lit(100.0) / n)
        .otherwise(lit(0.0)).as(s"${c}_null_pct"))
    val dupAggs = Seq(
      count(col(idCol)).as("id_rows"),
      countDistinct(col(idCol)).as("distinct_ids"))
    val todayRow = today
      .agg((nullAggs ++ dupAggs).head, (nullAggs ++ dupAggs).tail: _*).head()
    val todayPcts = columns.zipWithIndex.map { case (c, i) =>
      c -> (if (todayRow.isNullAt(i)) 0.0 else todayRow.getDouble(i))
    }.toMap

    val baseRow = Profiles.nullPcts(baseline, columns).head()
    val basePcts = columns.zipWithIndex.map { case (c, i) =>
      c -> (if (baseRow.isNullAt(i + 1)) 0.0 else baseRow.getDouble(i + 1))
    }.toMap
    val degraded = columns.filter(c => todayPcts(c) - basePcts(c) > degradationPts)

    val idRows = todayRow.getLong(columns.size)
    val distinctIds = todayRow.getLong(columns.size + 1)
    val dupPct =
      if (idRows == 0) 0.0 else (idRows - distinctIds).toDouble * 100 / idRows
    val issues = degraded.size + (if (dupPct > dupPctThreshold) 1 else 0)

    QualityStatus(todayPcts, dupPct, degraded,
      hasDegradation = issues > 0, severity = ladder.severity(issues.toDouble))
  }
}
