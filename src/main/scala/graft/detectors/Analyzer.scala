package graft.detectors

/** Pluggable analysis surface (SURVEY §2.10). The reference calls Vertex AI
  * Gemini per detector and falls back to fixed dicts when the call or JSON
  * parse fails (`utils/vertex_ai_handler.py:81-87`,
  * `monitoring/detectors/feed_detector.py:173-180`,
  * `revenue_detector.py:263-271`). The deterministic rule-based default IS
  * those fallback payloads — an LLM-backed implementation can be plugged in,
  * but never runs in tests or the engine's correctness path.
  */
trait Analyzer {
  def analyze(kind: String, context: Map[String, String]): Analysis
}

object RuleBasedAnalyzer extends Analyzer {
  override def analyze(kind: String, context: Map[String, String]): Analysis = kind match {
    case "missing_feeds" => Analysis(
      // mirrors feed_detector.py:173-180 fallback
      "Feed delivery failure or upstream system issue",
      "high",
      Seq("Check upstream data provider status",
        "Verify network connectivity",
        "Review feed delivery SLAs",
        "Contact data provider support"))
    case "revenue_anomaly" => Analysis(
      // mirrors revenue_detector.py:263-271 fallback
      "Unusual revenue pattern detected - requires investigation",
      "high",
      Seq("Verify data pipeline completeness",
        "Check for missing transaction batches",
        "Review recent system changes",
        "Compare with business events calendar"))
    case "volume_anomaly" => Analysis(
      "Transaction volume outside expected range",
      "medium",
      Seq("Check transaction ingestion lag",
        "Compare with same-hour historical volumes",
        "Review upstream batching schedules"))
    case "stale_data" => Analysis(
      "Data pipeline delay or source outage",
      "high",
      Seq("Check pipeline scheduler state",
        "Inspect source system availability",
        "Re-run the latest ingestion window"))
    case "quality_degradation" => Analysis(
      "Data quality regression in recent loads",
      "medium",
      Seq("Identify the first degraded load window",
        "Validate upstream schema changes",
        "Quarantine affected partitions"))
    case _ => Analysis(
      // mirrors vertex_ai_handler.py:81-87 generic fallback
      "Unknown issue - automated analysis unavailable",
      "medium",
      Seq("Manual investigation required"))
  }
}
