package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.AlertEvent

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp =
    Timestamp.from(java.time.Instant.parse(s))

  test("tumblingCounts: event-time 1h windows close as the watermark advances") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val df = input.toDF().toDF("ts", "value")
    val q = StreamingOps.tumblingCounts(df, "ts")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    // batch 1: events in the 10:00 and 11:00 windows
    input.addData(
      (ts("2024-01-01T10:05:00Z"), 1.0),
      (ts("2024-01-01T10:55:00Z"), 2.0),
      (ts("2024-01-01T11:05:00Z"), 3.0))
    q.processAllAvailable()
    // batches 2-3: advance event time so the 2h watermark passes 12:00
    input.addData((ts("2024-01-01T14:00:00Z"), 0.0))
    q.processAllAvailable()
    input.addData((ts("2024-01-01T15:00:00Z"), 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tumbling").orderBy("window_start").collect()
      .map(r => (r.getTimestamp(0).toInstant.toString, r.getLong(1), r.getDouble(2)))
    assert(rows.contains(("2024-01-01T10:00:00Z", 2L, 3.0)))
    assert(rows.contains(("2024-01-01T11:00:00Z", 1L, 3.0)))
  }

  test("feedFreshness: streaming max(arrival) per feed") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val q = StreamingOps.feedFreshness(input.toDF().toDF("feed_id", "ts"), "feed_id", "ts")
      .writeStream.format("memory").queryName("freshness")
      .outputMode("complete").start()
    input.addData(
      ("A", ts("2024-01-01T10:00:00Z")),
      ("A", ts("2024-01-01T12:00:00Z")),
      ("B", ts("2024-01-01T11:00:00Z")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("freshness").collect()
      .map(r => r.getString(0) -> r.getTimestamp(1).toInstant.toString).toMap
    assert(rows == Map(
      "A" -> "2024-01-01T12:00:00Z",
      "B" -> "2024-01-01T11:00:00Z"))
  }

  test("dedupStateful: suppresses repeats inside the window, passes after it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AlertEvent]
    val base = 1706659200000L // 2024-01-31T00:00:00Z
    // data enqueued before start; AvailableNow drains it then terminates
    // (processing-time timeouts would otherwise keep scheduling batches)
    input.addData(
      AlertEvent("revenue", "anomaly", base),
      AlertEvent("revenue", "anomaly", base + 60 * 1000),        // inside window -> dropped
      AlertEvent("revenue", "anomaly", base + 2 * 3600 * 1000),  // outside -> passes
      AlertEvent("feeds", "missing", base + 60 * 1000))          // different key -> passes
    val q = StreamingOps.dedupStateful(input.toDS(), windowMillis = 3600 * 1000L)
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val rows = spark.table("dedup").collect()
      .map(r => (r.getString(0), r.getLong(2))).sorted
    assert(rows.toSeq == Seq(
      ("feeds", base + 60 * 1000),
      ("revenue", base),
      ("revenue", base + 2 * 3600 * 1000)))
  }
}
