package graft.alerts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Catalog

/** Alert-history persistence in the reference's `monitoring_alerts` shape
  * (`monitoring/setup_bigquery.sql:45-58`: alert_id, alert_type, severity,
  * title, details JSON, recommendations JSON, created_at; partitioned by
  * DATE(created_at), 180-day retention). Details/recommendations are
  * serialized with `to_json` — the engine-side treatment of the reference's
  * JSON columns (SURVEY §1.2).
  */
object AlertStore {

  val RetentionDays = 180

  def toDataFrame(spark: SparkSession, alerts: Seq[Alert]): DataFrame = {
    import spark.implicits._
    alerts.map { a =>
      (a.alertType, a.severity, a.title, a.details, a.recommendations,
        java.sql.Timestamp.from(a.createdAt))
    }.toDF("alert_type", "severity", "title", "details_map", "recs_seq", "created_at")
      .select(
        // deterministic id from content (reference uses GENERATE_UUID();
        // content-hash keeps replays idempotent and tests stable)
        md5(concat_ws("|", col("alert_type"), col("title"), col("created_at").cast("string")))
          .as("alert_id"),
        col("alert_type"), col("severity"), col("title"),
        to_json(col("details_map")).as("details"),
        to_json(col("recs_seq")).as("recommendations"),
        col("created_at"),
        to_date(col("created_at")).as("alert_date"))
  }

  /** Append alert history, partitioned by alert_date (the scan-pruning key). */
  def append(catalog: Catalog, spark: SparkSession, alerts: Seq[Alert],
      ref: String = "financial_monitoring.monitoring_alerts"): Unit = {
    if (alerts.isEmpty) return
    // Catalog.append, not a raw parquet write to the table path: on a
    // manifest-committed table a raw write's files belong to NO snapshot,
    // so every alert appended after the table went manifest-mode would be
    // invisible to load() — silent history loss. The Catalog path also
    // keeps the partition-layout guard.
    catalog.append(toDataFrame(spark, alerts), ref, Seq("alert_date"))
  }

  /** Load history with the 180-day retention predicate applied at scan.
    *
    * The predicate runs on BOTH columns: `created_at` is the exact cutoff,
    * and the equivalent bound on `alert_date` (= `to_date(created_at)`, the
    * partition key) is what lets Spark prune ~all expired day directories at
    * planning time — the created_at filter alone reaches only row-group
    * stats inside files it already listed. */
  def load(catalog: Catalog, asOf: java.time.Instant,
      ref: String = "financial_monitoring.monitoring_alerts"): DataFrame = {
    val cutoff = asOf.minusSeconds(RetentionDays.toLong * 86400)
    val cutoffDate = java.sql.Date.valueOf(
      cutoff.atZone(java.time.ZoneOffset.UTC).toLocalDate)
    catalog.load(ref).filter(
      col("alert_date") >= lit(cutoffDate) &&
        graft.ops.TimeFilters.retention(col("created_at"), asOf, RetentionDays))
  }
}
