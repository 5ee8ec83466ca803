package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the reference's polled micro-batch
  * semantics (SURVEY §2.9). The reference runs everything as daily cron
  * batches (`dag/financial_monitoring_complete.py:175`); these are the
  * idiomatic upgrades for the always-on form of the same checks. Batch
  * parity does not depend on them — they're the scale/latency path.
  *
  *  - T1 trigger → `Trigger.AvailableNow` / `ProcessingTime` at the caller
  *  - T2 freshness → watermark + max(event_time) per micro-batch
  *  - W6 tumbling volume window → `groupBy(window(ts, "1 hour"))`
  *  - T4 alert dedup → keyed state with TTL in [[dedupStateful]]
  */
object StreamingOps {

  /** Tumbling event-time volume windows with late-data handling — the
    * streaming form of the current-hour volume check
    * (`transaction_detector.py:85-99`). */
  def tumblingCounts(
      events: DataFrame, tsCol: String, window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window).as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("n"), col("total_value"))

  /** Per-feed arrival freshness: latest event time per key per micro-batch —
    * monitoring `lastProgress.eventTime` against the watermark replaces the
    * reference's `now - MAX(arrival_time)` poll (`freshness_detector.py:96-108`). */
  def feedFreshness(
      events: DataFrame, keyCol: String, tsCol: String,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol))
      .agg(max(col(tsCol)).as("last_arrival"))

  final case class AlertKey(alertType: String, title: String)
  final case class AlertEvent(alertType: String, title: String, tsMillis: Long)
  final case class AlertEventTs(
      alertType: String, title: String, tsMillis: Long, ts: java.sql.Timestamp)
  final case class DedupState(lastSentMillis: Long)

  /** Stateful alert dedup — the streaming twin of
    * `AlertManager`'s 1-hour (type,title) suppression window
    * (`alert_manager.py:199-213`): first event per key passes, repeats
    * within `windowMillis` are dropped.
    *
    * State is bounded via EVENT-time timeout against the watermark (a
    * processing-time timeout would keep the micro-batch engine scheduling
    * wall-clock batches; event-time expiry advances with the data, which is
    * both deterministic and the right behavior during backfill at scale).
    *
    * `lateness` is the watermark delay, and it bounds a DIVERGENCE from
    * the batch-side [[graft.alerts.AlertManager]] twin: an alert arriving
    * more than `lateness` behind the max alert event time already seen is
    * dropped by the engine as late data BEFORE the dedup function runs —
    * even a first occurrence the batch twin would have dispatched. Alerts
    * from independent detectors skew across micro-batches, so the default
    * matches the suppression window itself (state cost is per distinct
    * (type, title), unchanged); shrink it only when alert event times are
    * known to be near-monotonic. */
  def dedupStateful(
      alerts: Dataset[AlertEvent], windowMillis: Long = 3600 * 1000L,
      lateness: String = "1 hour"): Dataset[AlertEvent] = {
    import alerts.sparkSession.implicits._
    alerts
      .withColumn("ts", timestamp_millis(col("tsMillis")))
      .withWatermark("ts", lateness)
      .as[AlertEventTs]
      .groupByKey(a => AlertKey(a.alertType, a.title))
      .flatMapGroupsWithState[DedupState, AlertEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, events, state: GroupState[DedupState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = events.toSeq.sortBy(_.tsMillis)
            val passed = scala.collection.mutable.ArrayBuffer.empty[AlertEvent]
            var last = state.getOption.map(_.lastSentMillis).getOrElse(Long.MinValue)
            sorted.foreach { e =>
              if (last == Long.MinValue || e.tsMillis - last >= windowMillis) {
                passed += AlertEvent(e.alertType, e.title, e.tsMillis)
                last = e.tsMillis
              }
            }
            state.update(DedupState(last))
            state.setTimeoutTimestamp(last + windowMillis)
            passed.iterator
          }
      }
  }
}
