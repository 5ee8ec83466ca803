package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Generic severity ladder (SURVEY §2.8): every reference detector classifies
  * a scalar into NONE/LOW/MEDIUM/HIGH/CRITICAL with its own cut points —
  * feed missing-% (`feed_detector.py:182-193`), staleness ratio
  * (`freshness_detector.py:171-186`), revenue deviation-%
  * (`revenue_detector.py:273-282`), etc. One parameterized ladder serves all
  * eight, both as a pure Scala function (driver-side statuses) and as a
  * codegen-friendly `when` chain (in-plan classification).
  */
final case class Thresholds(critical: Double, high: Double, medium: Double, low: Double = 0.0) {

  /** Pure form, for driver-side status objects. */
  def severity(value: Double): String =
    if (value >= critical) "CRITICAL"
    else if (value >= high) "HIGH"
    else if (value >= medium) "MEDIUM"
    else if (value > low) "LOW"
    else "NONE"

  /** Column form — a `when` ladder, stays inside whole-stage codegen. */
  def severityCol(value: Column): Column =
    when(value >= critical, "CRITICAL")
      .when(value >= high, "HIGH")
      .when(value >= medium, "MEDIUM")
      .when(value > low, "LOW")
      .otherwise("NONE")
}

object Thresholds {
  /** Reference cut points (absolute deviation %, `revenue_detector.py:273-282`). */
  val RevenueDeviation = Thresholds(critical = 50, high = 30, medium = 15)
  /** Missing-feed percentage (`feed_detector.py:182-193`). */
  val FeedMissing = Thresholds(critical = 50, high = 30, medium = 10)
  /** Transaction-volume deviation % (`transaction_detector.py:233-242`). */
  val TxnDeviation = Thresholds(critical = 70, high = 50, medium = 30)
  /** Reconciliation discrepancy % (`reconciliation_detector.py:205-214`). */
  val ReconDiscrepancy = Thresholds(critical = 5, high = 2, medium = 0.5)
}
