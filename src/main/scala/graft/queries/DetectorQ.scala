package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops._
import Q._

/** Detector-shaped queries: the reference's 8 monitoring checks re-expressed
  * as single declarative plans over the driver's stand-in tables
  * (FIXTURES.md table mapping: orders ≙ daily_revenue, events ≙ feed_arrivals).
  * Where the reference collects rows and finishes in python
  * (revenue_detector.py:124-136), the whole computation stays in the plan.
  */
object DetectorQ {

  private val BaselineStart = LocalDate.parse("2001-07-02") // today-30
  private val BaselineEnd = LocalDate.parse("2001-07-31")   // today-1

  /** Shared shape of q15/q16 (per-category revenue deviation). */
  private def categoryDeviation(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val orders = t(s, dir, "orders")
    val today = TimeFilters.filterOnDate(orders, "o_orderdate", OrdersToday)
      .groupBy(col("o_orderpriority").as("category"))
      .agg(Exact.sum2(col("o_totalprice")).as("today_rev"))
    val daily = TimeFilters.filterDateBetween(orders, "o_orderdate", BaselineStart, BaselineEnd)
      .groupBy(col("o_orderpriority").as("category"), to_date(col("o_orderdate")).as("d"))
      .agg(Exact.sum2(col("o_totalprice")).as("rev"))
    val base = daily.groupBy("category")
      .agg(Exact.avg2(col("rev")).as("avg_daily_rev"), count(lit(1)).as("n_days"))
    // the shared J1/J2 helper IS this query's join+deviation shape — one
    // definition of the >0-guarded pct formula across the detector queries
    Joins.keyedDeviation(today, base, "category", "today_rev", "avg_daily_rev")
      .withColumn("severity",
        Thresholds.RevenueDeviation.severityCol(abs(col("deviation_pct"))))
  }

  /** Trailing window over the shared `(partitionCols…, d, daily_total)`
    * daily-table shape, ordered by day within each key. An empty
    * `partitionCols` is the global-ORDER single-partition form — acceptable
    * only because the daily input is already aggregated (≤365 rows/entity);
    * the keyed form is the one that survives a 100× scale-up (see q40). */
  private def trailingWindow(partitionCols: Seq[String], frame: (Int, Int)) = {
    val base =
      if (partitionCols.isEmpty) Window.orderBy("d")
      else Window.partitionBy(partitionCols.map(col): _*).orderBy("d")
    base.rowsBetween(frame._1.toLong, frame._2.toLong)
  }

  /** Shared z-score block of q22/q40 (SURVEY §2.5 W1/W2): trailing-30
    * exclusive-of-today baseline via one-pass decimal-exact s/q/n — the
    * DECIMAL(18,2) accumulation is reassociation-safe, so the window's
    * fold order (and therefore the oracle hash) cannot depend on layout;
    * stats drop to double only after the windowed sums. `baseline_n >= 7`
    * is the defined-baseline contract (a week of history before a z-score
    * means anything); the fixed-decimal rounding absorbs 1-ulp
    * decimal→double divergence vs the DuckDB oracle's identical casts. */
  private def trailingZScore(daily: DataFrame, partitionCols: Seq[String]): DataFrame = {
    val w = trailingWindow(partitionCols, (-30, -1))
    val dec = col("daily_total").cast(DecimalType(18, 2))
    val out = partitionCols ++ Seq("d", "daily_total", "baseline_avg",
      "std_dev", "baseline_n", "z_score", "is_anomaly")
    daily
      .withColumn("s", sum(dec).over(w).cast("double"))
      .withColumn("q", sum(dec * dec).over(w).cast("double"))
      .withColumn("baseline_n", count(col("daily_total")).over(w))
      .filter(col("baseline_n") >= 7)
      .withColumn("baseline_avg", col("s") / col("baseline_n"))
      .withColumn("std_dev", Exact.stddevFrom(col("s"), col("q"), col("baseline_n")))
      .withColumn("z_score",
        ZScore.z(col("daily_total"), col("baseline_avg"), col("std_dev")))
      .withColumn("is_anomaly", ZScore.isAnomaly(col("z_score")))
      .withColumn("std_dev", round(col("std_dev"), 4))
      .withColumn("z_score", round(col("z_score"), 6))
      .select(out.head, out.tail: _*)
      .orderBy((partitionCols :+ "d").map(col): _*)
  }

  /** Shared 7-day moving-average block of q23/q41 (SURVEY §2.5 W5): same
    * decimal-exact windowed sum as [[trailingZScore]], inclusive frame. */
  private def trailingMa7(daily: DataFrame, partitionCols: Seq[String]): DataFrame = {
    val w = trailingWindow(partitionCols, (-6, 0))
    val dec = col("daily_total").cast(DecimalType(18, 2))
    val out = partitionCols ++ Seq("d", "daily_total", "ma7", "n7")
    daily
      .withColumn("s", sum(dec).over(w).cast("double"))
      .withColumn("n7", count(col("daily_total")).over(w))
      .withColumn("ma7", col("s") / col("n7"))
      .select(out.head, out.tail: _*)
      .orderBy((partitionCols :+ "d").map(col): _*)
  }

  /** Per-(category, day) decimal-exact totals — the keyed daily table
    * feeding q40/q41. */
  private def keyedDaily(s: org.apache.spark.sql.SparkSession, dir: String,
      from: LocalDate): DataFrame =
    TimeFilters.filterDateBetween(t(s, dir, "orders"), "o_orderdate",
        from, OrdersToday)
      .groupBy(col("o_orderpriority").as("category"),
        to_date(col("o_orderdate")).as("d"))
      .agg(Exact.sum2(col("o_totalprice")).as("daily_total"))

  private val categoryDeviationSql = """
        WITH today AS (
          SELECT o_orderpriority AS category,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS today_rev
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-08-01 00:00:00' AND o_orderdate < TIMESTAMP '2001-08-02 00:00:00'
          GROUP BY 1),
        daily AS (
          SELECT o_orderpriority AS category, CAST(o_orderdate AS DATE) AS d,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-07-02 00:00:00' AND o_orderdate < TIMESTAMP '2001-08-01 00:00:00'
          GROUP BY 1, 2),
        base AS (
          SELECT category,
            CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) / COUNT(rev) AS avg_daily_rev,
            COUNT(*) AS n_days
          FROM daily GROUP BY 1),
        j AS (
          SELECT category, today_rev, avg_daily_rev, n_days,
            CASE WHEN avg_daily_rev > 0 THEN (today_rev - avg_daily_rev) / avg_daily_rev * 100 END AS deviation_pct
          FROM today LEFT JOIN base USING (category))
        SELECT category, today_rev, avg_daily_rev, n_days, deviation_pct,
          CASE WHEN ABS(deviation_pct) >= 50 THEN 'CRITICAL'
               WHEN ABS(deviation_pct) >= 30 THEN 'HIGH'
               WHEN ABS(deviation_pct) >= 15 THEN 'MEDIUM'
               WHEN ABS(deviation_pct) > 0 THEN 'LOW'
               ELSE 'NONE' END AS severity
        FROM j"""

  val defs: Map[String, QueryDef] = Map(

    // W1/W2/A11/J4: the flagship revenue z-score check
    // (revenue_detector.py:21-136; SQL twin setup_bigquery.sql:143-168).
    // Daily totals -> one-pass baseline stats (avg/std/median/min/max/n) ->
    // z-score with the reference's std>0 guard -> |z|>2.5 anomaly flag.
    "q10_revenue_zscore" -> QueryDef(
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val daily = BaselineStats.dailyTotals(
          TimeFilters.filterDateBetween(orders, "o_orderdate", BaselineStart, BaselineEnd),
          "o_orderdate", "o_totalprice")
        val base = BaselineStats.stats(daily, "daily_total")
        val today = TimeFilters.filterOnDate(orders, "o_orderdate", OrdersToday)
          .agg(Exact.sum2(col("o_totalprice")).as("current_total"))
        today.crossJoin(base)
          .withColumn("z_score",
            ZScore.z(col("current_total"), col("baseline_value"), col("std_dev")))
          .withColumn("is_anomaly", ZScore.isAnomaly(col("z_score")))
          .select(
            lit(java.sql.Date.valueOf("2001-08-01")).as("as_of_date"),
            col("current_total"), col("baseline_value").as("baseline_avg"),
            // std_dev's sum-of-squares exceeds 2^53 in decimal units, so the
            // int128/BigDecimal -> double conversion may differ by 1 ulp
            // between engines; fixed-decimal rounding absorbs it. (The
            // oracle squares DECIMAL(19,2), not 18: DuckDB keeps an 18x18
            // multiply in int64 and overflows at sf>=0.1 daily totals,
            // while width 19 forces its exact int128 path — same value.
            // Spark's own decimal multiply widens automatically.)
            round(col("std_dev"), 4).as("std_dev"),
            col("median_value"), col("min_value"), col("max_value"),
            col("sample_size"), round(col("z_score"), 6).as("z_score"),
            col("is_anomaly"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_total
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-07-02 00:00:00' AND o_orderdate < TIMESTAMP '2001-08-01 00:00:00'
          GROUP BY 1),
        m AS (
          SELECT CAST(SUM(CAST(daily_total AS DECIMAL(18,2))) AS DOUBLE) AS s,
            CAST(SUM(CAST(daily_total AS DECIMAL(19,2)) * CAST(daily_total AS DECIMAL(19,2))) AS DOUBLE) AS q,
            COUNT(daily_total) AS n,
            quantile_cont(daily_total, 0.5) AS median_value,
            MIN(daily_total) AS min_value, MAX(daily_total) AS max_value
          FROM daily),
        t AS (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS current_total
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-08-01 00:00:00' AND o_orderdate < TIMESTAMP '2001-08-02 00:00:00'),
        z AS (
          SELECT current_total, s / n AS baseline_avg,
            sqrt(greatest((q - s * s / n) / (n - 1), 0.0)) AS std_dev,
            median_value, min_value, max_value, n AS sample_size
          FROM t, m)
        SELECT DATE '2001-08-01' AS as_of_date, current_total, baseline_avg,
          round(std_dev, 4) AS std_dev,
          median_value, min_value, max_value, sample_size,
          round(CASE WHEN std_dev > 0 THEN (current_total - baseline_avg) / std_dev ELSE 0.0 END, 6) AS z_score,
          ABS(CASE WHEN std_dev > 0 THEN (current_total - baseline_avg) / std_dev ELSE 0.0 END) > 2.5 AS is_anomaly
        FROM z""")),

    // W4/P7/O3: same-weekday seasonal baseline — last 12 same weekdays in a
    // 90-day lookback (revenue_detector.py:173-199).
    "q11_weekday_seasonal" -> QueryDef(
      (s, dir) => {
        val daily = BaselineStats.dailyTotals(
          TimeFilters.filterDateBetween(t(s, dir, "orders"), "o_orderdate",
            OrdersToday.minusDays(90), OrdersToday.minusDays(1)),
          "o_orderdate", "o_totalprice")
        daily
          .filter(date_format(col("d"), "EEEE") ===
            date_format(lit(java.sql.Date.valueOf("2001-08-01")), "EEEE"))
          .orderBy(col("d").desc).limit(12)
          .agg(
            (Exact.sum2(col("daily_total")) / count(lit(1))).as("seasonal_avg"),
            count(lit(1)).as("n_samples"))
          .withColumn("day_name",
            date_format(lit(java.sql.Date.valueOf("2001-08-01")), "EEEE"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_total
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-05-03 00:00:00' AND o_orderdate < TIMESTAMP '2001-08-01 00:00:00'
          GROUP BY 1),
        recent AS (
          SELECT * FROM daily
          WHERE strftime(d, '%A') = strftime(DATE '2001-08-01', '%A')
          ORDER BY d DESC LIMIT 12)
        SELECT CAST(SUM(CAST(daily_total AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS seasonal_avg,
          COUNT(*) AS n_samples,
          strftime(DATE '2001-08-01', '%A') AS day_name
        FROM recent""")),

    // W5: 7-day moving-average forecast (revenue_detector.py:284-311).
    "q12_forecast_ma7" -> QueryDef(
      (s, dir) => {
        val daily = BaselineStats.dailyTotals(
          TimeFilters.filterDateBetween(t(s, dir, "orders"), "o_orderdate",
            LocalDate.parse("2001-07-01"), OrdersToday),
          "o_orderdate", "o_totalprice")
        daily.orderBy(col("d").desc).limit(7)
          .agg(
            (Exact.sum2(col("daily_total")) / count(lit(1))).as("ma7_avg"),
            count(lit(1)).as("n_days"))
          .withColumn("forecast_3d", col("ma7_avg") * 3)
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_total
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-07-01 00:00:00' AND o_orderdate < TIMESTAMP '2001-08-02 00:00:00'
          GROUP BY 1),
        recent AS (SELECT * FROM daily ORDER BY d DESC LIMIT 7),
        m AS (
          SELECT CAST(SUM(CAST(daily_total AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS ma7_avg,
            COUNT(*) AS n_days
          FROM recent)
        SELECT ma7_avg, n_days, ma7_avg * 3 AS forecast_3d FROM m""")),

    // W3/P8: same-hour-of-day volume baseline vs the current hour
    // (transaction_detector.py:85-124).
    "q13_same_hour_baseline" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val perDay = TimeFilters.filterDateBetween(ev, "ts",
            LocalDate.parse("2024-01-01"), LocalDate.parse("2024-01-29"))
          .filter(hour(col("ts")) === 14)
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("cnt"))
        val base = perDay.agg(
            sum(col("cnt")).cast("double").as("s"),
            sum(col("cnt") * col("cnt")).cast("double").as("q"),
            count(lit(1)).as("n_days"),
            min(col("cnt")).as("min_count"),
            max(col("cnt")).as("max_count"))
          .select(
            (col("s") / col("n_days")).as("baseline_avg"),
            Exact.stddevFrom(col("s"), col("q"), col("n_days")).as("std_dev"),
            col("n_days"), col("min_count"), col("max_count"))
        val current = TimeFilters.filterOnDate(ev, "ts", EventsToday)
          .filter(hour(col("ts")) === 14)
          .agg(count(lit(1)).as("current_count"))
        current.crossJoin(base)
          .withColumn("z_score",
            ZScore.z(col("current_count"), col("baseline_avg"), col("std_dev")))
          .withColumn("is_anomaly", ZScore.isAnomaly(col("z_score")))
          .select(lit(14L).as("hour"), col("current_count"), col("baseline_avg"),
            col("std_dev"), col("min_count"), col("max_count"), col("n_days"),
            col("z_score"), col("is_anomaly"))
      },
      Some("""
        WITH per_day AS (
          SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt FROM events
          WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-30 00:00:00'
            AND EXTRACT(HOUR FROM ts) = 14
          GROUP BY 1),
        m AS (
          SELECT CAST(SUM(cnt) AS DOUBLE) AS s, CAST(SUM(cnt * cnt) AS DOUBLE) AS q,
            COUNT(*) AS n_days, MIN(cnt) AS min_count, MAX(cnt) AS max_count
          FROM per_day),
        b AS (
          SELECT s / n_days AS baseline_avg,
            sqrt(greatest((q - s * s / n_days) / (n_days - 1), 0.0)) AS std_dev,
            n_days, min_count, max_count
          FROM m),
        c AS (
          SELECT COUNT(*) AS current_count FROM events
          WHERE ts >= TIMESTAMP '2024-01-30 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'
            AND EXTRACT(HOUR FROM ts) = 14)
        SELECT CAST(14 AS BIGINT) AS hour, current_count, baseline_avg, std_dev,
          min_count, max_count, n_days,
          CASE WHEN std_dev > 0 THEN (current_count - baseline_avg) / std_dev ELSE 0.0 END AS z_score,
          ABS(CASE WHEN std_dev > 0 THEN (current_count - baseline_avg) / std_dev ELSE 0.0 END) > 2.5 AS is_anomaly
        FROM c, b""")),

    // J1/P10/P6 + severity ladder: today-vs-baseline per-key count deviation
    // (pattern_detector.py:70-101), baseline side broadcast.
    "q14_keyed_deviation_status" -> QueryDef(
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val today = TimeFilters.filterOnDate(orders, "o_orderdate", OrdersToday)
          .groupBy(col("o_orderstatus").as("status"))
          .agg(count(lit(1)).as("today_count"))
        val daily = TimeFilters.filterDateBetween(orders, "o_orderdate", BaselineStart, BaselineEnd)
          .groupBy(col("o_orderstatus").as("status"), to_date(col("o_orderdate")).as("d"))
          .agg(count(lit(1)).as("cnt"))
        val base = daily.groupBy("status")
          .agg(avg(col("cnt")).as("avg_daily_count"), count(lit(1)).as("n_days"))
        Joins.keyedDeviation(today, base, "status", "today_count", "avg_daily_count")
          .filter(col("avg_daily_count").isNotNull)
          .withColumn("severity",
            Thresholds.RevenueDeviation.severityCol(abs(col("deviation_pct"))))
          .orderBy("status")
      },
      Some("""
        WITH today AS (
          SELECT o_orderstatus AS status, COUNT(*) AS today_count FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-08-01 00:00:00' AND o_orderdate < TIMESTAMP '2001-08-02 00:00:00'
          GROUP BY 1),
        daily AS (
          SELECT o_orderstatus AS status, CAST(o_orderdate AS DATE) AS d, COUNT(*) AS cnt
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-07-02 00:00:00' AND o_orderdate < TIMESTAMP '2001-08-01 00:00:00'
          GROUP BY 1, 2),
        base AS (
          SELECT status, AVG(cnt) AS avg_daily_count, COUNT(*) AS n_days
          FROM daily GROUP BY 1),
        j AS (
          SELECT status, today_count, avg_daily_count, n_days,
            CASE WHEN avg_daily_count > 0 THEN (today_count - avg_daily_count) / avg_daily_count * 100 END AS deviation_pct
          FROM today LEFT JOIN base USING (status)
          WHERE avg_daily_count IS NOT NULL)
        SELECT status, today_count, avg_daily_count, n_days, deviation_pct,
          CASE WHEN ABS(deviation_pct) >= 50 THEN 'CRITICAL'
               WHEN ABS(deviation_pct) >= 30 THEN 'HIGH'
               WHEN ABS(deviation_pct) >= 15 THEN 'MEDIUM'
               WHEN ABS(deviation_pct) > 0 THEN 'LOW'
               ELSE 'NONE' END AS severity
        FROM j ORDER BY status""")),

    // J2: same shape keyed on category with revenue sums
    // (pattern_detector.py:103-152).
    "q15_keyed_deviation_category" -> QueryDef(
      (s, dir) => categoryDeviation(s, dir).orderBy("category"),
      Some(categoryDeviationSql + "\n        ORDER BY category")),

    // O2: top-1 worst deviation (pattern_detector.py:100-101).
    "q16_top1_deviation" -> QueryDef(
      (s, dir) => categoryDeviation(s, dir)
        .orderBy(abs(col("deviation_pct")).desc_nulls_last, col("category"))
        .limit(1),
      Some(categoryDeviationSql +
        "\n        ORDER BY ABS(deviation_pct) DESC NULLS LAST, category LIMIT 1")),

    // U1/T2/A8: per-source freshness probes unioned
    // (freshness_detector.py:81-112), staleness in whole minutes via
    // epoch-micros integer division (cross-engine floor semantics).
    "q18_freshness_union" -> QueryDef(
      (s, dir) => {
        val feeds = t(s, dir, "events")
          .agg(max(col("ts")).as("last_arrival"))
          .select(lit("feed_events").as("source"), col("last_arrival"),
            expr("(unix_micros(timestamp'2024-01-31 00:00:00') - unix_micros(last_arrival)) div 60000000")
              .as("minutes_stale"))
        val rev = t(s, dir, "orders")
          .agg(max(col("o_orderdate")).as("last_arrival"))
          .select(lit("daily_revenue").as("source"),
            col("last_arrival").cast("timestamp").as("last_arrival"),
            expr("(unix_micros(timestamp'2001-08-02 00:00:00') - unix_micros(cast(last_arrival as timestamp))) div 60000000")
              .as("minutes_stale"))
        feeds.union(rev)
          .withColumn("is_stale", col("minutes_stale") > 120)
          .orderBy("source")
      },
      Some("""
        SELECT * FROM (
          SELECT 'feed_events' AS source, MAX(ts) AS last_arrival,
            (epoch_us(TIMESTAMP '2024-01-31 00:00:00') - epoch_us(MAX(ts))) // 60000000 AS minutes_stale,
            (epoch_us(TIMESTAMP '2024-01-31 00:00:00') - epoch_us(MAX(ts))) // 60000000 > 120 AS is_stale
          FROM events
          UNION ALL
          SELECT 'daily_revenue' AS source, MAX(o_orderdate) AS last_arrival,
            (epoch_us(TIMESTAMP '2001-08-02 00:00:00') - epoch_us(MAX(o_orderdate))) // 60000000 AS minutes_stale,
            (epoch_us(TIMESTAMP '2001-08-02 00:00:00') - epoch_us(MAX(o_orderdate))) // 60000000 > 120 AS is_stale
          FROM orders)
        ORDER BY source""")),

    // A14/T6: processing velocity + SLA breach projection
    // (sla_detector.py:87-124): records/hour with NULLIF guard.
    "q19_velocity_sla" -> QueryDef(
      (s, dir) => {
        val win = t(s, dir, "events")
          .filter(TimeFilters.trailing(col("ts"), EventsNow, days = 1))
        Velocity.measure(win, "ts")
          .withColumn("projected_hours_100k", lit(100000) / col("records_per_hour"))
          .withColumn("will_breach_sla", lit(100000) / col("records_per_hour") > 4.0)
      },
      Some("""
        WITH v AS (
          SELECT COUNT(*) AS record_count, MIN(ts) AS first_record, MAX(ts) AS last_record,
            (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 60000000 AS minutes_elapsed
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-30 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00')
        SELECT record_count, first_record, last_record, minutes_elapsed,
          record_count / NULLIF(minutes_elapsed, 0) * 60 AS records_per_hour,
          100000 / (record_count / NULLIF(minutes_elapsed, 0) * 60) AS projected_hours_100k,
          100000 / (record_count / NULLIF(minutes_elapsed, 0) * 60) > 4.0 AS will_breach_sla
        FROM v""")),

    // J4/A12: two single-row CTEs cross-joined — today-vs-baseline metric
    // rate degradation (quality_detector.py:60-96 shape).
    "q20_quality_cross" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events")
        // guarded: COUNT is never null, so an empty slice is 0.0/0 — an
        // ANSI DIVIDE_BY_ZERO abort (double division included, the
        // varianceFrom lesson) where the oracle's 0*100.0/0 is NULL;
        // when-without-otherwise yields the same NULL
        def pct(df: org.apache.spark.sql.DataFrame, name: String) = {
          val n = count(lit(1))
          df.agg(when(n > 0,
            Profiles.countIf(col("value") < 0.1) * lit(100.0) / n).as(name))
        }
        val today = pct(TimeFilters.filterOnDate(ev, "ts", EventsToday), "today_pct")
        val base = pct(TimeFilters.filterDateBetween(ev, "ts",
          LocalDate.parse("2024-01-01"), LocalDate.parse("2024-01-29")), "baseline_pct")
        today.crossJoin(base)
          .withColumn("change_pct", col("today_pct") - col("baseline_pct"))
          .withColumn("has_degradation", col("today_pct") - col("baseline_pct") > 1.0)
      },
      Some("""
        WITH t AS (
          SELECT COUNT(CASE WHEN value < 0.1 THEN 1 END) * 100.0 / COUNT(*) AS today_pct
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-30 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'),
        b AS (
          SELECT COUNT(CASE WHEN value < 0.1 THEN 1 END) * 100.0 / COUNT(*) AS baseline_pct
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-30 00:00:00')
        SELECT today_pct, baseline_pct, today_pct - baseline_pct AS change_pct,
          today_pct - baseline_pct > 1.0 AS has_degradation
        FROM t, b""")),

    // W1 windowed form: trailing 30-row baseline + z-score for ALL days at
    // once via a window frame — the idiomatic Spark upgrade of the
    // one-anchor-date loop, with the reference's >=7 min-sample gate
    // (revenue_detector.py:126). Decimal-cast window sums keep it exact.
    "q22_trailing_window_zscore" -> QueryDef(
      (s, dir) => trailingZScore(
        BaselineStats.dailyTotals(
          TimeFilters.filterDateBetween(t(s, dir, "orders"), "o_orderdate",
            LocalDate.parse("2001-05-01"), OrdersToday),
          "o_orderdate", "o_totalprice"),
        partitionCols = Nil),
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_total
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-05-01 00:00:00' AND o_orderdate < TIMESTAMP '2001-08-02 00:00:00'
          GROUP BY 1),
        w AS (
          SELECT d, daily_total,
            CAST(SUM(CAST(daily_total AS DECIMAL(18,2))) OVER win AS DOUBLE) AS s,
            CAST(SUM(CAST(daily_total AS DECIMAL(19,2)) * CAST(daily_total AS DECIMAL(19,2))) OVER win AS DOUBLE) AS q,
            COUNT(daily_total) OVER win AS baseline_n
          FROM daily
          WINDOW win AS (ORDER BY d ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)),
        z AS (
          SELECT d, daily_total, s / baseline_n AS baseline_avg,
            sqrt(greatest((q - s * s / baseline_n) / (baseline_n - 1), 0.0)) AS std_dev, baseline_n
          FROM w WHERE baseline_n >= 7)
        SELECT d, daily_total, baseline_avg, round(std_dev, 4) AS std_dev, baseline_n,
          round(CASE WHEN std_dev > 0 THEN (daily_total - baseline_avg) / std_dev ELSE 0.0 END, 6) AS z_score,
          ABS(CASE WHEN std_dev > 0 THEN (daily_total - baseline_avg) / std_dev ELSE 0.0 END) > 2.5 AS is_anomaly
        FROM z ORDER BY d""")),

    // W5 windowed form: 7-day moving average per day via rowsBetween(-6, 0).
    "q23_ma7_window" -> QueryDef(
      (s, dir) => trailingMa7(
        BaselineStats.dailyTotals(
          TimeFilters.filterDateBetween(t(s, dir, "orders"), "o_orderdate",
            LocalDate.parse("2001-06-01"), OrdersToday),
          "o_orderdate", "o_totalprice"),
        partitionCols = Nil),
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_total
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00' AND o_orderdate < TIMESTAMP '2001-08-02 00:00:00'
          GROUP BY 1)
        SELECT d, daily_total,
          CAST(SUM(CAST(daily_total AS DECIMAL(18,2))) OVER win AS DOUBLE)
            / COUNT(daily_total) OVER win AS ma7,
          COUNT(daily_total) OVER win AS n7
        FROM daily
        WINDOW win AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY d""")),

    // W1 keyed-window form: the SAME trailing-30 z-score as q22, but
    // per-category with Window.partitionBy — the shape a 100 TB dataset
    // needs. The global-ORDER q22 window runs on ONE partition (fine only
    // because its input is a ~90-row daily table); partitionBy(category)
    // windows inside each key's partition, so the sort parallelizes and no
    // executor ever sees more than one key's history.
    "q40_keyed_window_zscore" -> QueryDef(
      (s, dir) => trailingZScore(
        keyedDaily(s, dir, LocalDate.parse("2001-05-01")),
        partitionCols = Seq("category")),
      Some("""
        WITH daily AS (
          SELECT o_orderpriority AS category, CAST(o_orderdate AS DATE) AS d,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_total
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-05-01 00:00:00' AND o_orderdate < TIMESTAMP '2001-08-02 00:00:00'
          GROUP BY 1, 2),
        w AS (
          SELECT category, d, daily_total,
            CAST(SUM(CAST(daily_total AS DECIMAL(18,2))) OVER win AS DOUBLE) AS s,
            CAST(SUM(CAST(daily_total AS DECIMAL(19,2)) * CAST(daily_total AS DECIMAL(19,2))) OVER win AS DOUBLE) AS q,
            COUNT(daily_total) OVER win AS baseline_n
          FROM daily
          WINDOW win AS (PARTITION BY category ORDER BY d ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)),
        z AS (
          SELECT category, d, daily_total, s / baseline_n AS baseline_avg,
            sqrt(greatest((q - s * s / baseline_n) / (baseline_n - 1), 0.0)) AS std_dev, baseline_n
          FROM w WHERE baseline_n >= 7)
        SELECT category, d, daily_total, baseline_avg, round(std_dev, 4) AS std_dev, baseline_n,
          round(CASE WHEN std_dev > 0 THEN (daily_total - baseline_avg) / std_dev ELSE 0.0 END, 6) AS z_score,
          ABS(CASE WHEN std_dev > 0 THEN (daily_total - baseline_avg) / std_dev ELSE 0.0 END) > 2.5 AS is_anomaly
        FROM z ORDER BY category, d""")),

    // W5 keyed-window form: per-category 7-day moving average
    // (partitionBy(category) — see q40 for why the keyed form is the one
    // that survives a 100x scale-up).
    "q41_keyed_ma7_window" -> QueryDef(
      (s, dir) => trailingMa7(
        keyedDaily(s, dir, LocalDate.parse("2001-06-01")),
        partitionCols = Seq("category")),
      Some("""
        WITH daily AS (
          SELECT o_orderpriority AS category, CAST(o_orderdate AS DATE) AS d,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_total
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00' AND o_orderdate < TIMESTAMP '2001-08-02 00:00:00'
          GROUP BY 1, 2)
        SELECT category, d, daily_total,
          CAST(SUM(CAST(daily_total AS DECIMAL(18,2))) OVER win AS DOUBLE)
            / COUNT(daily_total) OVER win AS ma7,
          COUNT(daily_total) OVER win AS n7
        FROM daily
        WINDOW win AS (PARTITION BY category ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY category, d"""))
  )
}
