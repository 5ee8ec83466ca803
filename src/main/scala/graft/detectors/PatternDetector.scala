package graft.detectors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Clock
import graft.ops.{Joins, Thresholds, TimeFilters}

/** Distribution pattern-break detection (reference
  * `monitoring/detectors/pattern_detector.py`): today's per-key volumes vs
  * per-key 30-day daily averages over configurable dimensions (region,
  * product_category), flagging keys whose deviation exceeds a threshold
  * (SURVEY §2.3 J1/J2, §2.2 P6/P10).
  *
  * API parity: `check_pattern_breaks()` → [[checkPatternBreaks]].
  * The baseline side is a per-key aggregate over few keys — broadcast, so
  * the today-side scan never shuffles (scale posture for wide fact tables).
  */
final class PatternDetector(
    facts: DataFrame, clock: Clock,
    dimensions: Seq[String] = Seq("region", "product_category"),
    tsCol: String = "transaction_date",
    baselineDays: Int = 30, breakThresholdPct: Double = 50.0,
    minDailyCount: Long = 0) {

  /** Break-count severity ladder (pattern_detector.py:234-243 shape). */
  private val ladder = Thresholds(critical = 4, high = 2, medium = 1)

  def checkPatternBreaks(): PatternStatus = {
    val today = clock.today
    val breaks = dimensions.flatMap { dim =>
      val todayCounts = TimeFilters.filterOnDate(facts, tsCol, today)
        .groupBy(col(dim).as("key"))
        .agg(count(lit(1)).cast("double").as("today_value"))
      val baseline = TimeFilters.filterDateBetween(facts, tsCol,
          today.minusDays(baselineDays.toLong), today.minusDays(1))
        .groupBy(col(dim).as("key"), to_date(col(tsCol)).as("d"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("key")
        .agg(avg(col("cnt")).as("baseline_avg"))
      // full-outer (vs the reference's LEFT JOIN, pattern_detector.py:98):
      // a key that VANISHED today would be invisible to a today-side left
      // join; coalescing today's count to 0 makes disappearance a -100% break.
      todayCounts.join(broadcast(baseline), Seq("key"), "full_outer")
        .withColumn("today_value", coalesce(col("today_value"), lit(0.0)))
        .withColumn("deviation_pct",
          when(col("baseline_avg") > 0,
            (col("today_value") - col("baseline_avg")) / col("baseline_avg") * 100))
        .filter(col("baseline_avg") > minDailyCount)
        .filter(abs(col("deviation_pct")) > breakThresholdPct)
        .orderBy(abs(col("deviation_pct")).desc, col("key"))
        .collect()
        .map(r => PatternBreak(dim, r.getAs[String]("key"),
          r.getAs[Double]("today_value"), r.getAs[Double]("baseline_avg"),
          r.getAs[Double]("deviation_pct")))
    }
    PatternStatus(breaks, breaks.nonEmpty, ladder.severity(breaks.size.toDouble))
  }
}
