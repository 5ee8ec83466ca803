package graft.queries

import org.apache.spark.sql.functions._
import graft.ops._
import Q._

/** Core relational operators from SURVEY §2.1/§2.2/§2.3/§2.4/§2.6/§2.7 over
  * the driver's TPC-H-ish tables. Each entry documents which inventory rows
  * it covers.
  */
object RelationalQ {

  val defs: Map[String, QueryDef] = Map(

    // A2/A5/A6/A8 + P2: grouped multi-aggregate with a pushable time filter
    // (TPC-H Q1 shape; reference daily/grouped scans e.g. pattern_detector.py:77-79).
    "q01_pricing_summary" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") < lit(java.sql.Timestamp.from(
            java.time.Instant.parse("2001-09-01T00:00:00Z"))))
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("count_order"),
            Exact.sum2(col("l_quantity")).as("sum_qty"),
            Exact.sum2(col("l_extendedprice")).as("sum_base_price"),
            // products carry 4 decimals — quantize at scale 4 so the
            // decimal cast never lands on a rounding tie (HALF_UP vs
            // HALF_EVEN would diverge between engines at scale 2)
            Exact.sumD(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
              .as("sum_disc_price"),
            (Exact.sum2(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (Exact.sum2(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          COUNT(*) AS count_order,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
          MIN(l_extendedprice) AS min_price,
          MAX(l_extendedprice) AS max_price
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '2001-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // A1/A5/A8: global scalar aggregate.
    "q02_global_totals" -> QueryDef(
      (s, dir) =>
        t(s, dir, "orders").agg(
          count(lit(1)).as("n_orders"),
          Exact.sum2(col("o_totalprice")).as("total_revenue"),
          (Exact.sum2(col("o_totalprice")) / count(lit(1))).as("avg_revenue"),
          min(col("o_totalprice")).as("min_revenue"),
          max(col("o_totalprice")).as("max_revenue")),
      Some("""
        SELECT COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_revenue,
          MIN(o_totalprice) AS min_revenue,
          MAX(o_totalprice) AS max_revenue
        FROM orders""")),

    // A4/A13/P5 (S8 schema introspection): dynamic per-column null profile,
    // one scan regardless of column count (utils/data_quality.py:12-17).
    "q03_null_profile" -> QueryDef(
      (s, dir) => Profiles.nullProfile(t(s, dir, "orders")),
      Some("""
        SELECT COUNT(*) AS total_rows,
          COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS o_orderkey_nulls,
          COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS o_custkey_nulls,
          COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS o_orderstatus_nulls,
          COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS o_totalprice_nulls,
          COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END) AS o_orderdate_nulls,
          COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS o_orderpriority_nulls
        FROM orders""")),

    // A3: COUNT(DISTINCT ...) incl. over an extracted date
    // (feed_detector.py:92 COUNT(DISTINCT DATE(ts))).
    "q04_count_distinct" -> QueryDef(
      (s, dir) =>
        t(s, dir, "events").agg(
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types"),
          countDistinct(to_date(col("ts"))).as("n_days")),
      Some("""
        SELECT COUNT(DISTINCT user_id) AS n_users,
          COUNT(DISTINCT event_type) AS n_types,
          COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
        FROM events""")),

    // A10: duplicate stats total vs distinct (quality_detector.py:121-147).
    "q05_dup_stats" -> QueryDef(
      (s, dir) => Profiles.dupStats(t(s, dir, "events"), "user_id"),
      Some("""
        SELECT total_rows, distinct_keys,
          total_rows - distinct_keys AS dup_count,
          CASE WHEN total_rows > 0
            THEN CAST(total_rows - distinct_keys AS DOUBLE) * 100 / CAST(total_rows AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS dup_pct
        FROM (SELECT COUNT(user_id) AS total_rows,
                     COUNT(DISTINCT user_id) AS distinct_keys FROM events)""")),

    // W8/P3: daily trend series (setup_bigquery.sql:171-179, feed_detector.py:197-206).
    "q06_daily_trend" -> QueryDef(
      (s, dir) => {
        val scoped = TimeFilters.filterDateBetween(
          t(s, dir, "orders"), "o_orderdate",
          java.time.LocalDate.parse("2001-06-01"), OrdersToday)
        BaselineStats.dailyTotals(scoped, "o_orderdate", "o_totalprice")
          .withColumn("avg_txn", col("daily_total") / col("txn_count"))
          .orderBy("d")
      },
      Some("""
        SELECT CAST(o_orderdate AS DATE) AS d,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_total,
          COUNT(*) AS txn_count,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_txn
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
          AND o_orderdate < TIMESTAMP '2001-08-02 00:00:00'
        GROUP BY 1 ORDER BY 1""")),

    // W7/P1: hourly bucketing on the "current" day (reconciliation_detector.py:104-119).
    "q07_hourly_buckets" -> QueryDef(
      (s, dir) =>
        TimeFilters.filterOnDate(t(s, dir, "events"), "ts", EventsToday)
          .groupBy(hour(col("ts")).cast("long").as("hour"))
          .agg(
            count(lit(1)).as("n"),
            Exact.sum6(col("value")).as("total_value"))
          .orderBy("hour"),
      Some("""
        SELECT EXTRACT(HOUR FROM ts) AS hour, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-30 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'
        GROUP BY 1 ORDER BY 1""")),

    // J3: full-outer hourly reconciliation with COALESCE on key and counts
    // (reconciliation_detector.py:120-128).
    "q08_full_outer_recon" -> QueryDef(
      (s, dir) => {
        val ev = TimeFilters.filterOnDate(t(s, dir, "events"), "ts", EventsToday)
        def hourly(typ: String, cnt: String) =
          ev.filter(col("event_type") === typ)
            .groupBy(hour(col("ts")).cast("long").as("hour"))
            .agg(count(lit(1)).as(cnt))
        Joins.reconcile(hourly("purchase", "source_count"), hourly("view", "dest_count"), "hour")
          .orderBy("hour")
      },
      Some("""
        WITH src AS (
          SELECT EXTRACT(HOUR FROM ts) AS hour, COUNT(*) AS source_count FROM events
          WHERE event_type = 'purchase'
            AND ts >= TIMESTAMP '2024-01-30 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'
          GROUP BY 1),
        dst AS (
          SELECT EXTRACT(HOUR FROM ts) AS hour, COUNT(*) AS dest_count FROM events
          WHERE event_type = 'view'
            AND ts >= TIMESTAMP '2024-01-30 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'
          GROUP BY 1)
        SELECT COALESCE(src.hour, dst.hour) AS hour,
          COALESCE(source_count, 0) AS source_count,
          COALESCE(dest_count, 0) AS dest_count,
          COALESCE(source_count, 0) - COALESCE(dest_count, 0) AS diff
        FROM src FULL OUTER JOIN dst ON src.hour = dst.hour
        ORDER BY hour""")),

    // J5/U2/P4: missing = expected − arrived as a left-anti join
    // (feed_detector.py:48 does this client-side with a python set).
    "q09_missing_feeds" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val expected = Seq("click", "error", "purchase", "signup", "view",
          "telemetry", "heartbeat").toDF("feed_id")
        val arrived = TimeFilters.filterOnDate(t(s, dir, "events"), "ts", EventsToday)
          .select(col("event_type").as("feed_id"))
        Joins.missingKeys(expected, arrived, "feed_id").orderBy("feed_id")
      },
      Some("""
        WITH expected(feed_id) AS (VALUES ('click'),('error'),('purchase'),('signup'),('view'),('telemetry'),('heartbeat')),
        arrived AS (
          SELECT DISTINCT event_type AS feed_id FROM events
          WHERE ts >= TIMESTAMP '2024-01-30 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00')
        SELECT feed_id FROM expected
        WHERE feed_id NOT IN (SELECT feed_id FROM arrived WHERE feed_id IS NOT NULL)
        ORDER BY feed_id""")),

    // O1: top-k by aggregate (revenue breakdown, revenue_detector.py:141-155).
    "q17_topk_categories" -> QueryDef(
      (s, dir) =>
        TimeFilters.filterDateBetween(
            t(s, dir, "orders"), "o_orderdate",
            java.time.LocalDate.parse("2001-07-01"), OrdersToday)
          .groupBy(col("o_orderpriority").as("category"))
          .agg(
            Exact.sum2(col("o_totalprice")).as("category_revenue"),
            count(lit(1)).as("txn_count"))
          .orderBy(desc("category_revenue"), col("category"))
          .limit(10),
      Some("""
        SELECT o_orderpriority AS category,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS category_revenue,
          COUNT(*) AS txn_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2001-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '2001-08-02 00:00:00'
        GROUP BY 1
        ORDER BY category_revenue DESC, category
        LIMIT 10""")),

    // §2.8 scalar-function sampler: concat/lpad id synthesis
    // (setup_bigquery.sql:85), weekday name (revenue_detector.py:182), hour
    // extraction, date arithmetic, CASE ladder, NULLIF/COALESCE, floor/round.
    "q21_scalar_functions" -> QueryDef(
      (s, dir) =>
        t(s, dir, "orders").filter(col("o_orderkey") <= 400)
          .select(
            col("o_orderkey"),
            concat(lit("FEED_"), lpad((col("o_orderkey") % 100).cast("string"), 3, "0"))
              .as("feed_code"),
            date_format(col("o_orderdate"), "EEEE").as("day_name"),
            hour(col("o_orderdate")).cast("long").as("order_hour"),
            date_sub(to_date(col("o_orderdate")), 7).as("d_minus7"),
            when(col("o_orderstatus") === "F", 1.0)
              .when(col("o_orderstatus") === "O", 2.0)
              .otherwise(0.5).as("status_score"),
            coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_or_pending"),
            round(col("o_totalprice"), 0).as("price_rounded"),
            floor(col("o_totalprice")).as("price_floor"))
          .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey,
          'FEED_' || lpad(CAST(o_orderkey % 100 AS VARCHAR), 3, '0') AS feed_code,
          strftime(o_orderdate, '%A') AS day_name,
          EXTRACT(HOUR FROM o_orderdate) AS order_hour,
          CAST(o_orderdate AS DATE) - 7 AS d_minus7,
          CAST(CASE WHEN o_orderstatus = 'F' THEN 1.0
               WHEN o_orderstatus = 'O' THEN 2.0
               ELSE 0.5 END AS DOUBLE) AS status_score,
          COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_pending,
          round(o_totalprice, 0) AS price_rounded,
          CAST(floor(o_totalprice) AS BIGINT) AS price_floor
        FROM orders WHERE o_orderkey <= 400
        ORDER BY o_orderkey""")),

    // A9/A2/A3: per-feed arrival profile incl. mean arrival hour
    // (feed_detector.py:84-114: AVG(EXTRACT(HOUR FROM arrival_time)) with
    // int() truncation for display at :109).
    "q38_arrival_profile" -> QueryDef(
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type").as("feed_id"))
          .agg(
            count(lit(1)).as("n_arrivals"),
            avg(hour(col("ts"))).as("avg_arrival_hour"),
            floor(avg(hour(col("ts")))).as("avg_hour_display"),
            countDistinct(to_date(col("ts"))).as("n_days"))
          .orderBy("feed_id"),
      Some("""
        SELECT event_type AS feed_id, COUNT(*) AS n_arrivals,
          AVG(EXTRACT(HOUR FROM ts)) AS avg_arrival_hour,
          CAST(floor(AVG(EXTRACT(HOUR FROM ts))) AS BIGINT) AS avg_hour_display,
          COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
        FROM events GROUP BY 1 ORDER BY 1""")),

    // S5 retention semantics: partition_expiration_days as a scan predicate
    // (setup_bigquery.sql:24 — 90d feeds; here 15d against the events span).
    "q36_retention_scan" -> QueryDef(
      (s, dir) =>
        t(s, dir, "events")
          .filter(TimeFilters.retention(col("ts"), EventsNow, 15))
          .agg(count(lit(1)).as("retained_rows"), min(col("ts")).as("oldest_ts")),
      Some("""
        SELECT COUNT(*) AS retained_rows, MIN(ts) AS oldest_ts
        FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'""")),

    // S6/J6/P9: deterministic synthetic feed generator — cross join of ranges
    // + LCG-derived values + the seeded gap (feeds 7/12/15 missing last 2
    // days, setup_bigquery.sql:82-126). rand() is engine-specific, so the
    // oracle-able variant derives values from an explicit LCG.
    "q37_feed_generator" -> QueryDef(
      (s, dir) => {
        val ids = s.range(450).toDF("id")
        ids
          .withColumn("feed_num", (col("id") % 15 + 1).cast("long"))
          .withColumn("day_offset", expr("id div 15"))
          .filter(!(col("feed_num").isin(7, 12, 15) && col("day_offset") < 2))
          .select(
            concat(lit("FEED_"), lpad(col("feed_num").cast("string"), 3, "0")).as("feed_id"),
            date_sub(lit(java.sql.Date.valueOf("2024-01-31")),
              col("day_offset").cast("int")).as("arrival_date"),
            ((col("id") * 1103515245L + 12345L) % 9999L).as("record_count"),
            lit("DataProvider_X").as("source_system"),
            lit("SUCCESS").as("status"))
          .orderBy("feed_id", "arrival_date")
      },
      Some("""
        WITH g AS (
          SELECT range AS id, range % 15 + 1 AS feed_num, range // 15 AS day_offset
          FROM range(450))
        SELECT 'FEED_' || lpad(CAST(feed_num AS VARCHAR), 3, '0') AS feed_id,
          DATE '2024-01-31' - CAST(day_offset AS INTEGER) AS arrival_date,
          (id * 1103515245 + 12345) % 9999 AS record_count,
          'DataProvider_X' AS source_system,
          'SUCCESS' AS status
        FROM g
        WHERE NOT (feed_num IN (7, 12, 15) AND day_offset < 2)
        ORDER BY feed_id, arrival_date"""))
  )
}
