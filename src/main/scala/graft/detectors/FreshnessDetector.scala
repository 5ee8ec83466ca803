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

  /** Severity on the WORST source's staleness ratio
    * `max(age_minutes) / max_age` (freshness_detector.py:171-186:
    * >=10x expected age CRITICAL, >=5x HIGH, >=2x MEDIUM, else LOW when
    * anything is stale). One source stale by 20x among ten is CRITICAL even
    * though only 10% of sources are stale. */
  private val ladder = Thresholds(critical = 10, high = 5, medium = 2)

  def checkDataFreshness(maxAgeMinutes: Long): FreshnessStatus = {
    val nowMicros = clock.now.toEpochMilli * 1000L
    // ONE action over a union of the per-source max-aggregates, not one
    // blocking .head() per source: the N scans are independent, and a
    // serial driver loop would make total latency the SUM of N jobs; the
    // union's branches schedule concurrently inside a single job
    val lastByIdx: Map[Int, java.sql.Timestamp] =
      if (sources.isEmpty) Map.empty
      else sources.zipWithIndex.map { case ((_, df, tsCol), i) =>
        df.agg(max(col(tsCol).cast("timestamp")).as("last_arrival"))
          .select(lit(i).as("i"), col("last_arrival"))
      }.reduce(_.unionAll(_))
        .collect()
        .flatMap(r => Option(r.getTimestamp(1)).map(r.getInt(0) -> _))
        .toMap
    val perSource = sources.zipWithIndex.map { case ((name, _, _), i) =>
      val last = lastByIdx.get(i)
      val minutes = last match {
        case Some(ts) => (nowMicros - ts.getTime * 1000L) / 60000000L
        case None => Long.MaxValue
      }
      SourceFreshness(name, last, minutes, minutes > maxAgeMinutes)
    }
    val stale = perSource.filter(_.isStale)
    val staleRatio =
      if (perSource.isEmpty) 0.0
      else stale.size.toDouble * 100 / perSource.size
    // a never-arrived source (minutes = Long.MaxValue) saturates to CRITICAL
    val maxStalenessRatio =
      if (stale.isEmpty) 0.0
      else stale.map(_.minutesStale).max.toDouble / maxAgeMinutes.toDouble
    // any stale source has ratio > 1 > `low`, so the ladder lands on LOW+
    FreshnessStatus(perSource, stale.nonEmpty, staleRatio,
      ladder.severity(maxStalenessRatio))
  }
}
