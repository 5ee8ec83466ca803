package graft.detectors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Clock
import graft.ops.{Thresholds, TimeFilters}

/** Distribution pattern-break detection (reference
  * `monitoring/detectors/pattern_detector.py`): today's per-key volumes vs
  * per-key 30-day daily averages over configurable dimensions (region,
  * product_category), flagging keys whose deviation exceeds a threshold
  * (SURVEY §2.3 J1/J2, §2.2 P6/P10).
  *
  * API parity: `check_pattern_breaks()` → [[checkPatternBreaks]]. Per-
  * dimension thresholds follow the reference: region breaks at >100%
  * deviation (pattern_detector.py:99), product_category at >80% (`:150`).
  *
  * Both joins are between tiny per-key aggregates, and both are
  * broadcastable shapes: today-LEFT-baseline builds the broadcast on the
  * baseline side (BroadcastHashJoin supports LeftOuter/BuildRight), and the
  * vanished-key probe is a left-anti with today's keys broadcast — unlike a
  * full-outer join, where a broadcast hint is unsupported and silently
  * degrades to a shuffle.
  */
final class PatternDetector(
    facts: DataFrame, clock: Clock,
    dimensions: Seq[(String, Double)] =
      Seq("region" -> 100.0, "product_category" -> 80.0),
    tsCol: String = "transaction_date",
    baselineDays: Int = 30,
    minDailyCount: Long = 0) {

  /** Break-count severity ladder (pattern_detector.py:234-243 shape). */
  private val ladder = Thresholds(critical = 4, high = 2, medium = 1)

  def checkPatternBreaks(): PatternStatus = {
    val today = clock.today
    val breaks = dimensions.flatMap { case (dim, breakThresholdPct) =>
      val todayCounts = TimeFilters.filterOnDate(facts, tsCol, today)
        .groupBy(col(dim).as("key"))
        .agg(count(lit(1)).cast("double").as("today_value"))
      val baseline = TimeFilters.filterDateBetween(facts, tsCol,
          today.minusDays(baselineDays.toLong), today.minusDays(1))
        .groupBy(col(dim).as("key"), to_date(col(tsCol)).as("d"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("key")
        .agg(avg(col("cnt")).as("baseline_avg"))
        // keys whose average fell at/below minDailyCount keep their TRUE
        // baseline_avg but are not measurement-eligible on baseline volume
        // alone: dropping the row (the old shape) made them
        // indistinguishable from brand-new keys, so a handful of low-volume
        // dimension values read as "new" breaks (+100%, baseline 0.0) and
        // could ladder up to critical. They can still EARN measurement on
        // today's volume — see the deviation branch below.
        .withColumn("eligible", col("baseline_avg") > minDailyCount)
      // reference shape (pattern_detector.py:98): today LEFT JOIN baseline.
      // Both joins are null-safe (<=>): a null dimension value forms a real
      // group in both aggregates, and plain equality would (a) never pair it
      // in the left join — today's null-key volume could never be flagged —
      // and (b) report the baseline's null group as vanished on EVERY run
      // even with null rows present today, a permanent false positive that
      // inflates breaks.size into the severity ladder
      val b = baseline.withColumnRenamed("key", "bkey")
      // beyond the reference, symmetric with `vanished` below: a key with
      // today-volume but NO baseline history at all is a brand-new dimension
      // value — an appearance is a break (+100%), regardless of the pct
      // threshold, PROVIDED today's volume clears the same minDailyCount
      // floor the baseline side applies (a single stray row on a new key is
      // below the detector's own materiality line and must not ladder
      // toward critical). A key with real-but-sub-threshold history is NOT
      // new: it reports its true baseline_avg, and is measured against it
      // whenever TODAY's volume clears the same minDailyCount floor —
      // otherwise a low-volume key that surges (baseline 1.5/day, today
      // 5000) could never flag while a truly-new key with the same today
      // volume flags at +100%, i.e. having a little history would suppress
      // alerting more than having none. A sub-threshold key that stays
      // quiet today (neither side clears the floor) remains unmeasured.
      val present = todayCounts.join(broadcast(b), col("key") <=> col("bkey"), "left")
        .withColumn("new_key",
          col("baseline_avg").isNull && col("today_value") > minDailyCount)
        .withColumn("baseline_avg", coalesce(col("baseline_avg"), lit(0.0)))
        .withColumn("deviation_pct",
          when(col("new_key"), lit(100.0))
            .otherwise(when(
              (col("eligible") || col("today_value") > minDailyCount)
                && col("baseline_avg") > 0,
              (col("today_value") - col("baseline_avg")) / col("baseline_avg") * 100)))
        .filter(col("new_key") || abs(col("deviation_pct")) > breakThresholdPct)
      // beyond the reference: a key present all baseline days but absent
      // today is invisible to the today-side left join; a disappearance is
      // always a break (deviation -100%), regardless of the pct threshold
      // only measurement-eligible baselines can "vanish" — a key that was
      // already excluded for sub-threshold volume is not a disappearance
      val vanished = b.filter(col("eligible"))
        .join(broadcast(todayCounts.select("key")), col("bkey") <=> col("key"), "left_anti")
        .select(col("bkey").as("key"), lit(0.0).as("today_value"),
          col("baseline_avg"), lit(-100.0).as("deviation_pct"))
      present.select("key", "today_value", "baseline_avg", "deviation_pct")
        .union(vanished)
        .orderBy(abs(col("deviation_pct")).desc, col("key"))
        .collect()
        .map(r => PatternBreak(dim, r.getAs[String]("key"),
          r.getAs[Double]("today_value"), r.getAs[Double]("baseline_avg"),
          r.getAs[Double]("deviation_pct")))
    }
    PatternStatus(breaks, breaks.nonEmpty, ladder.severity(breaks.size.toDouble))
  }
}
