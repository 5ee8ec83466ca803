package graft.ext

import org.apache.spark.sql.DataFrame

/** Shared input-shape guard for the persisted-relation consumers
  * (collision tables, bucketed ANN corpora): a clear builder-naming
  * message instead of an unresolved-column analysis error. */
private[ext] object TableShapes {
  /** Column presence under the ANALYZER's resolution rules — the one
    * membership test every guard and path-choice in ext/ must share:
    * case-insensitive unless spark.sql.caseSensitive is on. A raw
    * `columns.contains` would reject (or worse, silently miss and
    * recompute past) a `Cluster`/`CODES` table every downstream query
    * resolves fine. */
  def hasColumn(df: DataFrame, name: String): Boolean = {
    val caseSensitive = df.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    if (caseSensitive) df.columns.contains(name)
    else df.columns.exists(_.equalsIgnoreCase(name))
  }

  def requireColumns(df: DataFrame, needed: Seq[String], fn: String,
      hint: String): Unit =
    require(needed.forall(hasColumn(df, _)),
      s"$fn requires columns (${needed.mkString(", ")}); " +
        s"got ${df.columns.mkString(", ")} — $hint")
}
