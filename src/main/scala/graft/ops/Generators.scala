package graft.ops

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic data generators (SURVEY §2.1 S6) reproducing the
  * reference's sample-data block (`monitoring/setup_bigquery.sql:82-126`)
  * as distributed range/cross-join plans — including the seeded scenarios
  * its detectors must fire on: feeds 7/12/15 missing the last 2 days
  * (`:93-95`), today's revenue low / yesterday's high (`:104-107`). Used
  * by tests and demos; the LCG-deterministic oracle-able variant is q37.
  *
  * Jitter comes from a hash of the row id, NOT `rand(seed)`: Spark seeds
  * rand per PARTITION, so the same seed yields different values whenever
  * the range's partitioning changes (local[8] vs local[32], a repartition
  * upstream) — "seeded" would hold per layout only. Hashing the id makes
  * every generated row a pure function of (id, seed) on any layout.
  */
object Generators {

  /** Uniform [0, 1) derived from (id, seed) — layout-independent. */
  private def u(seed: Long) =
    pmod(xxhash64(col("id"), lit(seed)), lit(1L << 20)).cast("double") /
      lit((1L << 20).toDouble)

  /** 15 feeds × `days` days of arrivals with the seeded gap (P9 row
    * exclusion). */
  def feedArrivals(spark: SparkSession, asOf: LocalDate, feeds: Int = 15,
      days: Int = 30, seed: Long = 42L): DataFrame = {
    val gapFeeds = Seq(7, 12, 15)
    spark.range(feeds.toLong * days).toDF("id")
      .withColumn("feed_num", (col("id") % feeds + 1).cast("int"))
      .withColumn("day_offset", expr(s"id div $feeds").cast("int"))
      .filter(!(col("feed_num").isin(gapFeeds: _*) && col("day_offset") < 2))
      .select(
        concat(lit("FEED_"), lpad(col("feed_num").cast("string"), 3, "0")).as("feed_id"),
        // arrival at 06:00-10:00 UTC, jittered by the seeded id hash
        to_timestamp(concat(
          date_sub(lit(java.sql.Date.valueOf(asOf)), col("day_offset")).cast("string"),
          lit(" 0"), (lit(6) + floor(u(seed) * 4)).cast("string"), lit(":00:00")))
          .as("arrival_time"),
        (lit(5000) + floor(u(seed + 1) * 10000)).cast("long").as("record_count"),
        lit("DataProvider_X").as("source_system"),
        lit("SUCCESS").as("status"))
  }

  /** `days` days of revenue transactions, ~`txnsPerDay` per day, with the
    * reference's seeded anomalies: day 0 (asOf) low ~80% below normal,
    * day 1 high ~30% above (`setup_bigquery.sql:104-107` shape, scaled). */
  def dailyRevenue(spark: SparkSession, asOf: LocalDate, days: Int = 60,
      txnsPerDay: Int = 100, seed: Long = 42L): DataFrame = {
    val categories = array(Seq("Electronics", "Clothing", "Food", "Books", "Other").map(lit): _*)
    val regions = array(Seq("NORTH_AMERICA", "EUROPE", "ASIA", "OTHER").map(lit): _*)
    spark.range(days.toLong * txnsPerDay).toDF("id")
      .withColumn("day_offset", expr(s"id div $txnsPerDay").cast("int"))
      .withColumn("base_amount", lit(50.0) + u(seed) * 150.0)
      .withColumn("amount",
        when(col("day_offset") === 0, col("base_amount") * 0.2)   // seeded low today
          .when(col("day_offset") === 1, col("base_amount") * 1.3) // seeded high yesterday
          .otherwise(col("base_amount")))
      .select(
        concat(lit("TXN_"), col("id").cast("string")).as("transaction_id"),
        to_timestamp(concat(
          date_sub(lit(java.sql.Date.valueOf(asOf)), col("day_offset")).cast("string"),
          lit(" 12:00:00"))).as("transaction_date"),
        col("amount").as("revenue"),
        element_at(categories, (pmod(col("id"), lit(5)) + 1).cast("int")).as("product_category"),
        element_at(regions, (pmod(col("id"), lit(4)) + 1).cast("int")).as("region"),
        concat(lit("CUST_"), pmod(col("id") * 7919, lit(10000)).cast("string")).as("customer_id"),
        lit("SALE").as("transaction_type"))
  }
}
