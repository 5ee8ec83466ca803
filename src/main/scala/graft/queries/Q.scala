package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registry entry: a Spark implementation plus (when SQL-expressible) the
  * equivalent ANSI/DuckDB SQL the driver's oracle runs over the same parquet
  * tables. Column names and row order are part of the contract — every
  * computed column is aliased identically on both sides, and every
  * multi-row result carries a deterministic ORDER BY.
  */
final case class QueryDef(
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    bench: Boolean = true)

object Q {
  /** Load one of the driver test tables (TESTDATA.md).
    *
    * The events table's `ts` encoding has varied across driver testdata
    * generations — TIMESTAMP(NANOS) (surfacing as a LongType of nanoseconds
    * under `spark.sql.legacy.parquet.nanosAsLong`, set by
    * Sessions/Verify/Bench) and TIMESTAMP(MICROS) without UTC adjustment
    * (surfacing as TIMESTAMP_NTZ). Both normalize here to a proper
    * TimestampType so every downstream `unix_micros`/window/watermark sees
    * one type.
    *
    * The NTZ branch must be SESSION-TIMEZONE-INDEPENDENT like the nanos
    * branch beside it: a bare `cast("timestamp")` reinterprets the wall
    * clock in the session zone, silently shifting every instant for any
    * caller that didn't pin UTC. `from_utc_timestamp(cast, sessionTz)`
    * cancels that shift — the stored wall clock becomes the same UTC
    * instant under every session zone (exact for fixed-offset zones; a
    * zone's DST transition window can differ by the transition delta,
    * which UTC — every in-repo session — never has). */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) => df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.from_utc_timestamp(
          org.apache.spark.sql.functions.col("ts").cast("timestamp"),
          s.conf.get("spark.sql.session.timeZone")))
      case _ => df
    }
  }

  // Fixed anchors replacing CURRENT_DATE()/CURRENT_TIMESTAMP() (SURVEY §7.4):
  // orders span 1995-01-01..2001-08-01, events span 2024-01-01..2024-01-30.
  val OrdersToday = java.time.LocalDate.parse("2001-08-01")
  val EventsNow: java.time.Instant = java.time.Instant.parse("2024-01-31T00:00:00Z")
  val EventsToday = java.time.LocalDate.parse("2024-01-30")
}
