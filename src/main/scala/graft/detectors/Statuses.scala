package graft.detectors

import java.sql.Timestamp

/** Typed status ADTs — the engine's replacement for the reference's nested
  * dicts passed between Airflow tasks via XCom (SURVEY §1.1,
  * `dag/financial_monitoring_dag.py:62,89-90`). */

final case class Baseline(
    avg: Double, stdDev: Double, median: Double,
    min: Double, max: Double, n: Long)

final case class Analysis(
    rootCause: String, urgency: String, recommendedActions: Seq[String])

final case class FeedStatus(
    expectedCount: Int, arrivedCount: Long, missingFeeds: Seq[String],
    missingPct: Double, severity: String, analysis: Option[Analysis])

final case class RevenueStatus(
    date: java.time.LocalDate, currentTotal: Double, baseline: Option[Baseline],
    zScore: Double, isAnomaly: Boolean, deviationPct: Double, severity: String,
    breakdown: Seq[(String, Double)], analysis: Option[Analysis])

final case class VolumeStatus(
    hour: Int, currentCount: Long, baseline: Option[Baseline],
    zScore: Double, isAnomaly: Boolean, deviationPct: Double, severity: String)

final case class SourceFreshness(
    source: String, lastArrival: Option[Timestamp], minutesStale: Long, isStale: Boolean)

final case class FreshnessStatus(
    sources: Seq[SourceFreshness], isStale: Boolean, staleRatio: Double, severity: String)

final case class PatternBreak(
    dimension: String, key: String, todayValue: Double,
    baselineAvg: Double, deviationPct: Double)

final case class PatternStatus(
    breaks: Seq[PatternBreak], hasBreaks: Boolean, severity: String)

final case class HourlyDiff(hour: Long, sourceCount: Long, destCount: Long, diff: Long)

final case class ReconStatus(
    sourceCount: Long, destCount: Long, discrepancy: Long, discrepancyPct: Double,
    isReconciled: Boolean, hourlyBreakdown: Seq[HourlyDiff], severity: String)

final case class SlaStatus(
    recordCount: Long, recordsPerHour: Double, projectedHours: Double,
    willBreachSla: Boolean, severity: String)

final case class QualityStatus(
    nullPcts: Map[String, Double], dupPct: Double, degradedColumns: Seq[String],
    hasDegradation: Boolean, severity: String)
