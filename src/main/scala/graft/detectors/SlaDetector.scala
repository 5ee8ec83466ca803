package graft.detectors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Clock
import graft.ops.{Thresholds, TimeFilters, Velocity}

/** SLA breach prediction from processing velocity (reference
  * `monitoring/detectors/sla_detector.py`): records/hour over a trailing
  * window (`count / NULLIF(minutes,0) * 60`, SURVEY §2.4 A14) projected
  * against "total records within slaHours".
  *
  * API parity: `predict_sla_breach(total_records, sla_hours)` →
  * [[predictSlaBreach]]; reference defaults 100k records / 4h
  * (`dag/financial_monitoring_complete.py:106`).
  */
final class SlaDetector(
    stream: DataFrame, clock: Clock,
    tsCol: String = "arrival_time", windowHours: Int = 1) {

  /** Breach-margin severity ladder in hours over the SLA
    * (sla_detector.py:191-200 shape). */
  private val ladder = Thresholds(critical = 2, high = 1, medium = 0)

  def predictSlaBreach(totalRecords: Long = 100000L, slaHours: Double = 4.0): SlaStatus = {
    val r = Velocity.measure(
      stream.filter(TimeFilters.trailing(col(tsCol), clock.now, hours = windowHours)),
      tsCol).head()
    val recordCount = r.getLong(0)
    // records_per_hour is null in two OPPOSITE situations: no records at
    // all (a stalled feed — rate 0 and a projected breach is the right
    // read), and a burst whose first-to-last span is under one minute
    // (the FASTEST possible processing — rate 0 would page on-call at
    // peak throughput). For the burst, fall back to the whole-window
    // lower bound: the records demonstrably arrived within windowHours.
    val rph =
      if (!r.isNullAt(4)) r.getDouble(4)
      else if (recordCount > 0) recordCount.toDouble / windowHours
      else 0.0
    val (projected, breach) = Velocity.projectBreach(recordCount, totalRecords, rph, slaHours)
    val margin = projected - slaHours
    // margin > 0 whenever breach, so the ladder yields at least MEDIUM
    SlaStatus(recordCount, rph, projected, breach,
      if (breach) ladder.severity(margin) else "NONE")
  }
}
