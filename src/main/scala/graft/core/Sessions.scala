package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the confs this engine assumes everywhere.
  *
  * Scale posture (tested on local[32], designed for a 1000-executor cluster):
  *  - AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  *    dynamic broadcast conversion replace hand-tuned partition counts when
  *    the same plans run at 100 TB.
  *  - shuffle.partitions defaults to the local core count here; on a real
  *    cluster it is set to 2-3x total cores and AQE coalesces down.
  *  - UTC session timezone: BigQuery `CURRENT_DATE()`/`DATE(ts)` are UTC-based
  *    (SURVEY §7.4); pinning UTC keeps date extraction parity.
  */
object Sessions {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
