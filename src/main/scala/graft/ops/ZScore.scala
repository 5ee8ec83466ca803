package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-score anomaly flagging (SURVEY §2.5 W2). Mirrors the reference's guard
  * semantics exactly: z = (x - mean)/std when std > 0 else 0
  * (`monitoring/detectors/revenue_detector.py:48-52`), anomaly when |z| >
  * threshold (2.5 in both revenue and transaction detectors,
  * `revenue_detector.py:52`, `transaction_detector.py:49`).
  */
object ZScore {
  val DefaultThreshold = 2.5

  def z(x: Column, mean: Column, std: Column): Column =
    when(std > 0, (x - mean) / std).otherwise(lit(0.0))

  def isAnomaly(zScore: Column, threshold: Double = DefaultThreshold): Column =
    abs(zScore) > threshold

  /** Deviation percent vs an expected value, guarded like the reference's
    * `(current-avg)/avg*100` with avg>0 checks (`transaction_detector.py:45`). */
  def deviationPct(x: Column, expected: Column): Column =
    when(expected > 0, (x - expected) / expected * 100).otherwise(lit(0.0))
}
