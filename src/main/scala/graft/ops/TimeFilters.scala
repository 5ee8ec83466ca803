package graft.ops

import java.sql.Timestamp
import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-window predicates (SURVEY §2.2 P1-P3). Every detector in the
  * reference scopes its scan with one of these (e.g. partition-date equality
  * `monitoring/detectors/feed_detector.py:39`, trailing-interval
  * `feed_detector.py:97`, baseline BETWEEN `revenue_detector.py:117`).
  *
  * Scale note: these predicates are plain range comparisons on the raw
  * timestamp column, so Catalyst pushes them into the parquet scan
  * (PushedFilters + row-group stats skipping) and, on date-partitioned
  * layouts, prunes partitions — at 100 TB a 30-day baseline reads 30
  * partitions, not the full table. We deliberately avoid `to_date(ts) === d`
  * (a cast wrapped around the column defeats pushdown) in favor of the
  * equivalent half-open timestamp range.
  *
  * All conversions go LocalDate -> Instant via UTC explicitly, so results do
  * not depend on the JVM default timezone (session TZ is pinned UTC).
  */
object TimeFilters {

  def utcTs(d: LocalDate): Timestamp =
    Timestamp.from(d.atStartOfDay(ZoneOffset.UTC).toInstant)

  /** `DATE(ts) = d` (P1) as a pushable half-open range. */
  def onDate(ts: Column, d: LocalDate): Column =
    ts >= lit(utcTs(d)) && ts < lit(utcTs(d.plusDays(1)))

  /** `ts >= asOf - (days+hours) && ts < asOf` (P2 trailing window). */
  def trailing(ts: Column, asOf: Instant, days: Int = 0, hours: Int = 0): Column = {
    val lo = asOf.minusSeconds(days.toLong * 86400 + hours.toLong * 3600)
    ts >= lit(Timestamp.from(lo)) && ts < lit(Timestamp.from(asOf))
  }

  /** `DATE(ts) BETWEEN start AND end` (P3), inclusive, as a pushable range. */
  def dateBetween(ts: Column, start: LocalDate, end: LocalDate): Column =
    ts >= lit(utcTs(start)) && ts < lit(utcTs(end.plusDays(1)))

  /** Retention predicate (SURVEY §2.1 S5): the reference declares
    * `partition_expiration_days` per table (`setup_bigquery.sql:24,41,57,74`);
    * we inject the equivalent scan-time filter. */
  def retention(ts: Column, asOf: Instant, retainDays: Int): Column =
    ts >= lit(Timestamp.from(asOf.minusSeconds(retainDays.toLong * 86400)))

  def filterOnDate(df: DataFrame, tsCol: String, d: LocalDate): DataFrame =
    df.filter(onDate(col(tsCol), d))

  def filterDateBetween(df: DataFrame, tsCol: String, start: LocalDate, end: LocalDate): DataFrame =
    df.filter(dateBetween(col(tsCol), start, end))
}
