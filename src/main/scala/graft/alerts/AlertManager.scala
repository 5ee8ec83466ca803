package graft.alerts

import scala.collection.mutable

import graft.core.Clock

/** One alert record — mirrors the `monitoring_alerts` table shape
  * (reference `monitoring/setup_bigquery.sql:45-58`). */
final case class Alert(
    alertType: String, severity: String, title: String,
    details: Map[String, String], recommendations: Seq[String],
    createdAt: java.time.Instant)

/** Delivery channel (reference channels: log/slack/email,
  * `monitoring/alerts/alert_manager.py:103-189`). Slack/Email are offline
  * stubs here — they render the exact payload and hand it to a transport
  * function that defaults to a no-op (no network in tests, ever). */
trait AlertSink {
  def name: String
  def send(alert: Alert, rendered: String): Unit
}

final class LogSink extends AlertSink {
  val name = "log"
  override def send(alert: Alert, rendered: String): Unit =
    System.err.println(s"[alert:${alert.severity}] $rendered")
}

/** Test/driver sink that records everything it receives. */
final class InMemorySink(val name: String = "memory") extends AlertSink {
  val received = mutable.ArrayBuffer.empty[(Alert, String)]
  override def send(alert: Alert, rendered: String): Unit =
    received += ((alert, rendered))
}

final class SlackSink(transport: String => Unit = _ => ()) extends AlertSink {
  val name = "slack"
  override def send(alert: Alert, rendered: String): Unit = transport(rendered)
}

final class EmailSink(transport: String => Unit = _ => ()) extends AlertSink {
  val name = "email"
  override def send(alert: Alert, rendered: String): Unit = transport(rendered)
}

/** Severity-routed, deduplicating alert dispatch (reference
  * `monitoring/alerts/alert_manager.py:24-55`).
  *
  * - Dedup: identical (alertType, title) suppressed within `dedupWindow`
  *   (1 hour, `alert_manager.py:199-213`) — driver-side state keyed by the
  *   injectable [[Clock]]; the streaming twin lives in
  *   `graft.streaming.StreamingOps.dedupStateful`.
  * - Routing (`alert_manager.py:44-52`): CRITICAL → log+slack+email,
  *   HIGH → slack+email, MEDIUM → slack, LOW → log.
  */
final class AlertManager(
    clock: Clock, sinks: Seq[AlertSink],
    dedupWindow: java.time.Duration = java.time.Duration.ofHours(1)) {

  private val lastSent = mutable.Map.empty[(String, String), java.time.Instant]
  val history = mutable.ArrayBuffer.empty[Alert]

  private val routing: Map[String, Seq[String]] = Map(
    "CRITICAL" -> Seq("log", "slack", "email"),
    "HIGH" -> Seq("slack", "email"),
    "MEDIUM" -> Seq("slack"),
    "LOW" -> Seq("log"))

  /** Emoji ladder (`alert_manager.py:59-66`); unknown severities fall back
    * to the reference's 📢. */
  private val emoji: Map[String, String] = Map(
    "CRITICAL" -> "🚨", "HIGH" -> "⚠️", "MEDIUM" -> "📊", "LOW" -> "ℹ️")

  /** API parity: `send_alert(type, severity, title, details,
    * recommendations)` (`alert_manager.py:24`). Returns false when
    * deduplicated or unroutable. */
  def sendAlert(
      alertType: String, severity: String, title: String,
      details: Map[String, String] = Map.empty,
      recommendations: Seq[String] = Nil): Boolean = {
    val key = (alertType, title)
    val now = clock.now
    val dup = lastSent.get(key).exists(prev =>
      java.time.Duration.between(prev, now).compareTo(dedupWindow) < 0)
    if (dup) return false
    val channels = routing.getOrElse(severity, Nil)
    if (channels.isEmpty) return false
    lastSent(key) = now
    val alert = Alert(alertType, severity, title, details, recommendations, now)
    history += alert
    val rendered = format(alert)
    sinks.filter(s => channels.contains(s.name)).foreach(_.send(alert, rendered))
    true
  }

  /** API parity: `create_feed_alert(feed_status)`
    * (`alert_manager.py:215-239`) — builds the FEED alert from a detector
    * status: expected/arrived/missing counts, first 10 missing ids, and the
    * analyzer's recommended actions (reference defaults when absent).
    * Severity NONE produces nothing. Returns whether an alert was sent. */
  def createFeedAlert(s: graft.detectors.FeedStatus): Boolean = {
    if (s.severity == "NONE") return false
    val missing = s.missingFeeds.size
    sendAlert(
      alertType = "FEED",
      severity = s.severity,
      title = s"Missing Feeds Detected: $missing feeds",
      details = Map(
        "Expected Feeds" -> s.expectedCount.toString,
        "Arrived Feeds" -> s.arrivedCount.toString,
        "Missing Feeds" -> missing.toString,
        "Missing IDs" -> s.missingFeeds.take(10).mkString(", ")),
      recommendations = s.analysis.map(_.recommendedActions).getOrElse(Seq(
        "Check upstream data providers",
        "Verify network connectivity",
        "Review feed processing logs")))
  }

  /** API parity: `create_revenue_alert(revenue_status)`
    * (`alert_manager.py:241-263`) — REVENUE alert with the reference's
    * Drop/Spike direction in the title, signed deviation, dollar impact
    * (current − baseline avg) and 2-decimal z-score. Severity NONE produces
    * nothing. Returns whether an alert was sent. */
  def createRevenueAlert(s: graft.detectors.RevenueStatus): Boolean = {
    if (s.severity == "NONE") return false
    val baselineAvg = s.baseline.map(_.avg).getOrElse(0.0)
    val direction = if (s.deviationPct < 0) "Drop" else "Spike"
    sendAlert(
      alertType = "REVENUE",
      severity = s.severity,
      title = f"Revenue $direction: ${math.abs(s.deviationPct)}%.1f%% deviation",
      details = Map(
        "Current Revenue" -> s.currentTotal.toString,
        "Expected Revenue" -> baselineAvg.toString,
        "Deviation" -> f"${s.deviationPct}%+.1f%%",
        "Dollar Impact" -> (s.currentTotal - baselineAvg).toString,
        "Z-Score" -> f"${s.zScore}%.2f"),
      recommendations = s.analysis.map(_.recommendedActions).getOrElse(Seq(
        "Investigate transaction data",
        "Check for system issues",
        "Review pricing changes")))
  }

  /** Formatter (`alert_manager.py:57-101`): emoji header, detail lines with
    * currency/percent formatting, numbered recommendations. */
  def format(a: Alert): String = {
    val header = s"${emoji.getOrElse(a.severity, "📢")} [${a.severity}] ${a.title}"
    val details = a.details.toSeq.sortBy(_._1).map { case (k, v) =>
      val shown = formatValue(k, v)
      s"  • $k: $shown"
    }
    val recs = a.recommendations.zipWithIndex.map { case (r, i) => s"  ${i + 1}. $r" }
    (Seq(header) ++ details ++
      (if (recs.nonEmpty) "  Recommendations:" +: recs else Nil)).mkString("\n")
  }

  private def formatValue(key: String, v: String): String = {
    val lower = key.toLowerCase
    def asDouble = try Some(v.toDouble) catch { case _: NumberFormatException => None }
    if (lower.contains("revenue") || lower.contains("amount") ||
        lower.contains("dollar") || lower.contains("impact"))
      asDouble.map(d => f"$$$d%,.2f").getOrElse(v)
    else if (lower.contains("pct") || lower.contains("percent"))
      asDouble.map(d => f"$d%.1f%%").getOrElse(v)
    else v
  }
}
