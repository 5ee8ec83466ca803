package graft.ext

import org.apache.spark.sql.DataFrame

/** Shared input-shape guard for the persisted-relation consumers
  * (collision tables, bucketed ANN corpora): a clear builder-naming
  * message instead of an unresolved-column analysis error. */
private[ext] object TableShapes {
  def requireColumns(df: DataFrame, needed: Seq[String], fn: String,
      hint: String): Unit = {
    // match the analyzer's resolution, not something stricter: Spark
    // resolves columns case-insensitively unless spark.sql.caseSensitive
    // is on, so a caller-built `Bucket`/`BKEY` table that the downstream
    // query would accept must pass the guard too
    val caseSensitive = df.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    val ok =
      if (caseSensitive) (n: String) => df.columns.contains(n)
      else (n: String) => df.columns.exists(_.equalsIgnoreCase(n))
    require(needed.forall(ok),
      s"$fn requires columns (${needed.mkString(", ")}); " +
        s"got ${df.columns.mkString(", ")} — $hint")
  }
}
