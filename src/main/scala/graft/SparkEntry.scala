package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DetectorQ, ExtQ, Q, QueryDef, RelationalQ}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY §2 (plus the
  * BASELINE.json extension surface) to a Spark implementation; `oracleSql`
  * carries the DuckDB-equivalent SQL for every SQL-expressible entry.
  * Column names and row order are aligned pairwise (the driver sorts columns
  * by name and hash-compares values).
  */
object SparkEntry {

  val all: Map[String, QueryDef] = {
    val parts = Seq(RelationalQ.defs, DetectorQ.defs, ExtQ.defs)
    val merged = parts.reduce(_ ++ _)
    // Map ++ silently keeps the right-hand entry on a key collision — a
    // query registered under an existing name in another file would
    // shrink the registry (one fewer Verify dump, one fewer bench row)
    // with no signal anywhere. Fail at first touch instead.
    if (merged.size != parts.map(_.size).sum) {
      val dups = parts.flatMap(_.keys).groupBy(identity)
        .collect { case (k, v) if v.size > 1 => k }.toSeq.sorted
      sys.error(s"duplicate query name(s) across registry files: ${dups.mkString(", ")}")
    }
    merged
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the revenue z-score anomaly check (SURVEY §7.2 minimum end-to-end slice). */
  def entry(spark: SparkSession): DataFrame =
    all("q10_revenue_zscore").spark(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.spark }

  /** The benchmark subset: registry entries minus proof-only configurations
    * (entries whose deliberately exhaustive parameters exist to certify
    * correctness against an oracle, with a production-shaped twin carrying
    * the benched form). Correctness (Verify) always runs the full registry. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    all.collect { case (k, d) if d.bench => k -> d.spark }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine-hash-based minhash/simhash/LSH/langid) → rows-only check. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, d) if d.oracle.isDefined => k -> d.oracle.get.trim }

  /** JSON string escape shared by the two driver-contract mains: backslash,
    * quote, and ALL control chars (<0x20) — a tab, CR, or backslash in
    * builder-authored SQL or doc prose would otherwise make the driver's
    * json.load fail and silently zero the round's gate. */
  private[graft] def jsonString(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
