package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The FIXTURES.md column mappings from the driver's `events` table onto
  * the reference's monitored tables — ONE definition shared by every
  * consumer (batch demo, streaming monitoring loop), so a mapping change
  * cannot silently diverge between them.
  */
object EventViews {

  /** `events` → `feed_arrivals` (feed_id←event_type, arrival_time←ts,
    * record_count←value). */
  def feedView(events: DataFrame): DataFrame = events.select(
    col("event_type").as("feed_id"),
    col("ts").as("arrival_time"),
    col("value").cast("long").as("record_count"))

  /** `events` → `daily_revenue` (transaction_id←event_id,
    * transaction_date←ts, revenue←value, product_category←event_type,
    * customer_id←user_id; region has no events-side source → constant). */
  def revenueView(events: DataFrame): DataFrame = events.select(
    col("event_id").cast("string").as("transaction_id"),
    col("ts").as("transaction_date"),
    col("value").as("revenue"),
    col("event_type").as("product_category"),
    lit("ALL").as("region"),
    col("user_id").cast("string").as("customer_id"))
}
