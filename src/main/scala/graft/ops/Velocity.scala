package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Processing-velocity / SLA math (SURVEY §2.4 A14, §2.9 T6). Mirrors
  * `monitoring/detectors/sla_detector.py:87-124`: records/hour over a
  * trailing window as `count / NULLIF(minutes,0) * 60`, then a breach
  * projection `remaining / rate` vs the SLA deadline.
  *
  * Minutes are derived from epoch MICROseconds with integer division —
  * floor semantics that match across engines (double-epoch division then a
  * cast would round differently in different engines).
  */
object Velocity {

  /** One row: record_count, first/last ts, elapsed minutes, records_per_hour. */
  def measure(df: DataFrame, tsCol: String): DataFrame =
    df.agg(
        count(lit(1)).as("record_count"),
        min(col(tsCol)).as("first_record"),
        max(col(tsCol)).as("last_record"))
      .withColumn("minutes_elapsed",
        expr("(unix_micros(last_record) - unix_micros(first_record)) div 60000000"))
      .withColumn("records_per_hour",
        col("record_count") / nullif(col("minutes_elapsed"), lit(0L)) * 60)

  /** Pure projection used by the SLA detector (`sla_detector.py:104-124`). */
  def projectBreach(processed: Long, total: Long, recordsPerHour: Double,
      slaHours: Double): (Double, Boolean) = {
    val remaining = (total - processed).max(0L)
    if (recordsPerHour <= 0) (Double.PositiveInfinity, remaining > 0)
    else {
      val hoursNeeded = remaining / recordsPerHour
      (hoursNeeded, hoursNeeded > slaHours)
    }
  }
}
