package graft.detectors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Clock
import graft.ops.Thresholds

/** Data freshness / staleness detection (reference
  * `monitoring/detectors/freshness_detector.py`): per-source
  * `now - MAX(event_ts) > max_age` — the batch surrogate of a streaming
  * watermark (SURVEY §2.9 T2; the readStream twin is
  * `graft.streaming.StreamingOps.freshness`).
  *
  * API parity: `check_data_freshness(max_age_minutes)` →
  * [[checkDataFreshness]] over named (table, tsCol) sources.
  */
final class FreshnessDetector(
    sources: Seq[(String, DataFrame, String)], clock: Clock) {

  /** Severity on the percentage of sources that are stale
    * (freshness_detector.py:171-186 ratio ladder). */
  private val ladder = Thresholds(critical = 50, high = 25, medium = 1)

  def checkDataFreshness(maxAgeMinutes: Long): FreshnessStatus = {
    val nowMicros = clock.now.toEpochMilli * 1000L
    val perSource = sources.map { case (name, df, tsCol) =>
      val r = df.agg(max(col(tsCol).cast("timestamp")).as("last_arrival")).head()
      val last = Option(r.getTimestamp(0))
      val minutes = last match {
        case Some(ts) => (nowMicros - ts.getTime * 1000L) / 60000000L
        case None => Long.MaxValue
      }
      SourceFreshness(name, last, minutes, minutes > maxAgeMinutes)
    }
    val staleRatio =
      if (perSource.isEmpty) 0.0
      else perSource.count(_.isStale).toDouble * 100 / perSource.size
    FreshnessStatus(perSource, perSource.exists(_.isStale), staleRatio,
      ladder.severity(staleRatio))
  }
}
