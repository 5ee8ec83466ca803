package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-shaped ops from SURVEY §2.3.
  *
  * Scale posture: every reference join keys on a low-cardinality dimension
  * (region, category, hour, feed_id), so the small side is broadcast —
  * `broadcast()` is applied explicitly where we KNOW the side is an aggregate
  * over few keys, turning a shuffle join into a map-side hash join. At 100 TB
  * the big side streams through unshuffled.
  */
object Joins {

  /** Missing = expected − arrived (J5). The reference does this client-side
    * with a python set difference (`feed_detector.py:48`); the canonical
    * distributed form is a left-anti join. `expected` is a small dim →
    * the arrived side is aggregated per key first, keeping the anti-join tiny.
    */
  def missingKeys(expected: DataFrame, arrived: DataFrame, key: String): DataFrame =
    expected.join(arrived.select(key).distinct(), Seq(key), "left_anti")

  /** Scale variant of [[missingKeys]] for when the expected side is too big
    * to broadcast as an exact key set (say 10^9 expected entity ids at
    * 100 TB): build a Bloom filter over the EXPECTED keys (~1.2 bytes/key
    * at 1% fpp — 10-50x smaller than a broadcast hash set) and use it to
    * prune the arrived side AT SCAN TIME before the distinct+anti-join, so
    * arrivals for keys outside the expected universe never enter the
    * shuffle at all.
    *
    * Exactness: pruning the anti-join's right side with a Bloom filter is
    * semantically free — false positives only let through irrelevant
    * arrivals that then match nothing in the join (no effect on a
    * left_anti result), and Bloom filters have no false negatives, so no
    * genuinely-arrived expected key is ever dropped. The final answer is
    * bit-identical to [[missingKeys]]; the OpsSpec equivalence test pins it.
    *
    * Keys are compared as strings on both build and probe sides, making the
    * helper type-agnostic. `approxExpectedKeys` sizes the filter (overshoot
    * is cheap; undershoot only raises the fpp).
    *
    * The probe is Spark's native [[org.apache.spark.sql.catalyst.expressions.
    * BloomFilterMightContain]] over `xxhash64(key)` with the serialized
    * filter inlined as a binary literal — the same expression pair the
    * runtime-filter optimizer injects, and fully codegen'd, unlike the
    * Scala udf + driver broadcast it replaces (the repo's last udf). A null
    * key hashes to null and might_contain(null) is null, so null-keyed
    * arrivals are dropped exactly as the old `k != null &&` probe did. */
  def missingKeysBloom(expected: DataFrame, arrived: DataFrame, key: String,
      approxExpectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(approxExpectedKeys, fpp)
    val buildAgg = GraftColumnBridge.column(
      new BloomFilterAggregate(
        GraftColumnBridge.expression(xxhash64(col(key).cast("string"))),
        Literal(approxExpectedKeys), Literal(numBits)).toAggregateExpression())
    val filterBytes = expected.agg(buildAgg).head().getAs[Array[Byte]](0)
    val probe = GraftColumnBridge.column(new BloomFilterMightContain(
      Literal.create(filterBytes, BinaryType),
      GraftColumnBridge.expression(xxhash64(col(key).cast("string")))))
    missingKeys(expected, arrived.filter(probe), key)
  }

  /** Today-vs-baseline keyed deviation (J1/J2 + P10): left join today's
    * per-key totals against per-key baseline averages, compute deviation %.
    * Baseline side is an aggregate over few keys → broadcast. */
  def keyedDeviation(today: DataFrame, baseline: DataFrame, key: String,
      todayCol: String = "today_value", baseCol: String = "baseline_avg"): DataFrame =
    today.join(broadcast(baseline), Seq(key), "left")
      .withColumn("deviation_pct",
        when(col(baseCol) > 0, (col(todayCol) - col(baseCol)) / col(baseCol) * 100))

  /** Full-outer hourly reconciliation with COALESCE on key and counts (J3),
    * mirroring `reconciliation_detector.py:120-128`. Both sides are 24-row
    * hourly aggregates → broadcast-able, but full_outer keeps it symmetric. */
  def reconcile(src: DataFrame, dst: DataFrame, key: String,
      srcCnt: String = "source_count", dstCnt: String = "dest_count"): DataFrame =
    src.join(dst, Seq(key), "full_outer")
      .select(
        col(key),
        coalesce(col(srcCnt), lit(0L)).as(srcCnt),
        coalesce(col(dstCnt), lit(0L)).as(dstCnt))
      .withColumn("diff", col(srcCnt) - col(dstCnt))
}
