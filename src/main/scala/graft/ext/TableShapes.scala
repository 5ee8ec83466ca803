package graft.ext

import org.apache.spark.sql.DataFrame

/** Shared input-shape guard for the persisted-relation consumers
  * (collision tables, bucketed ANN corpora): a clear builder-naming
  * message instead of an unresolved-column analysis error. */
private[ext] object TableShapes {
  def requireColumns(df: DataFrame, needed: Seq[String], fn: String,
      hint: String): Unit =
    require(needed.forall(df.columns.contains),
      s"$fn requires columns (${needed.mkString(", ")}); " +
        s"got ${df.columns.mkString(", ")} — $hint")
}
