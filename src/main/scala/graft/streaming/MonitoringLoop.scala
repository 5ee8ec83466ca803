package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.alerts.AlertManager
import graft.core.{Catalog, Clock, FixedClock}
import graft.detectors._
import graft.pipeline.{MonitoringResult, MonitoringRunner}

/** Per-micro-batch record of what the loop saw and decided. */
final case class BatchOutcome(batchId: Long, batchRows: Long, result: MonitoringResult)

/** The always-on, end-to-end form of the reference's complete monitoring
  * DAG (`dag/financial_monitoring_complete.py:181-195`): ONE streaming job
  * whose every micro-batch ingests the new events into the monitored table
  * and runs the full 8-detector fan-out + guarded alert dispatch over the
  * updated table. The reference's daily 17:00 cron cadence collapses to
  * `Trigger.AvailableNow`; `ProcessingTime` makes the same job continuous
  * (SURVEY §2.9 T1). Alert dedup carries ACROSS micro-batches because the
  * shared [[AlertManager]] holds the (type, title) suppression state on the
  * driver — the same 1-hour window as the reference (`alert_manager.py:199`).
  *
  * Scale design:
  *  - Ingest is an append-only parquet write (atomic per task file); at
  *    100 TB partition it by event date so the detectors' date-window
  *    filters prune partitions instead of scanning history. Per-batch
  *    detector cost is bounded by their trailing windows, not total size.
  *  - "Now" is EVENT time — the max `ts` ingested so far — so a backfill
  *    replays with identical decisions, and tests pin the timeline. This is
  *    the batch-side mirror of the streaming watermark.
  *  - The detector suite itself is the SAME code the daily batch run uses:
  *    one semantics, two execution modes.
  */
final class MonitoringLoop(
    catalog: Catalog, table: String, alerts: AlertManager,
    expectedFeeds: Seq[String],
    checkTime: String = "17:00",
    slaTotalRecords: Long = 100000L, slaHours: Double = 4.0,
    maxAgeMinutes: Long = 240L,
    partitionBy: Seq[String] = Nil) {

  private val runner = new MonitoringRunner(alerts)
  private val outcomeBuf = mutable.ArrayBuffer.empty[BatchOutcome]

  /** Most recent per-batch results kept for observability — bounded so an
    * always-on loop doesn't grow driver memory with its batch count. */
  val maxOutcomes: Int = 1000

  /** Per-batch results, oldest first (up to [[maxOutcomes]], newest kept). */
  def outcomes: Seq[BatchOutcome] = outcomeBuf.toSeq

  /** `feed_arrivals` view of the events table (FIXTURES.md mapping). */
  private def feedView(events: DataFrame): DataFrame = events.select(
    col("event_type").as("feed_id"),
    col("ts").as("arrival_time"),
    col("value").cast("long").as("record_count"))

  /** `daily_revenue` view of the events table (FIXTURES.md mapping). */
  private def revenueView(events: DataFrame): DataFrame = events.select(
    col("event_id").cast("string").as("transaction_id"),
    col("ts").as("transaction_date"),
    col("value").as("revenue"),
    col("event_type").as("product_category"),
    lit("ALL").as("region"),
    col("user_id").cast("string").as("customer_id"))

  /** Event-time clock: "now" is the latest ingested `ts`. Deterministic
    * under replay/backfill; an empty table reads as the epoch. */
  private def eventClock(events: DataFrame): Clock =
    events.agg(max(col("ts").cast("timestamp"))).head().get(0) match {
      case t: java.sql.Timestamp => FixedClock(t.toInstant)
      case _ => FixedClock(java.time.Instant.EPOCH)
    }

  /** The foreachBatch body — public so batch jobs and tests can drive the
    * exact same per-tick logic without a streaming source. */
  def runBatch(batch: DataFrame, batchId: Long): MonitoringResult = {
    val rows = batch.count()
    catalog.append(batch, table, partitionBy)
    val events = catalog.load(table)
    val feeds = feedView(events)
    val revenue = revenueView(events)
    val clock = eventClock(events)

    val result = runner.run(
      feeds = () => new FeedDetector(feeds, clock)
        .checkFeedStatus(expectedFeeds, checkTime),
      revenue = () => new RevenueDetector(revenue, clock)
        .checkRevenueAnomaly(clock.today),
      volume = () => new TransactionDetector(feeds, clock, tsCol = "arrival_time")
        .checkTransactionVolume(hours = 1),
      freshness = () => new FreshnessDetector(
        Seq((table, feeds, "arrival_time")), clock)
        .checkDataFreshness(maxAgeMinutes),
      patterns = () => new PatternDetector(revenue, clock).checkPatternBreaks(),
      recon = () => new ReconciliationDetector(clock)
        .checkReconciliation(revenue, revenue, clock.today.minusDays(1)),
      sla = () => new SlaDetector(feeds, clock).predictSlaBreach(slaTotalRecords, slaHours),
      quality = () => new QualityDetector(revenue, clock).checkQualityDegradation())

    outcomeBuf += BatchOutcome(batchId, rows, result)
    if (outcomeBuf.size > maxOutcomes) outcomeBuf.remove(0, outcomeBuf.size - maxOutcomes)
    result
  }

  /** Attach the loop to an events stream. AvailableNow reproduces the
    * reference's polled cadence and drains what's queued; ProcessingTime
    * keeps it running on `interval`.
    *
    * Pass `checkpoint` for restart durability: offsets commit after each
    * batch, so a restarted job resumes at the first unprocessed batch. The
    * ingest append is then effectively at-least-once (a batch that crashed
    * between append and commit re-appends on restart) — at scale,
    * deduplicate on a batch-id/event-id key downstream or write through an
    * ACID table format; alert dedup already absorbs replays by design. */
  def start(stream: DataFrame, queryName: String = "graft_monitoring_loop",
      continuous: Boolean = false, interval: String = "1 minute",
      checkpoint: Option[String] = None): StreamingQuery = {
    val w0 = stream.writeStream
      .queryName(queryName)
      .foreachBatch((batch: DataFrame, id: Long) => { runBatch(batch, id); () })
    val w = checkpoint.fold(w0)(p => w0.option("checkpointLocation", p))
    (if (continuous) w.trigger(Trigger.ProcessingTime(interval))
     else w.trigger(Trigger.AvailableNow())).start()
  }
}
