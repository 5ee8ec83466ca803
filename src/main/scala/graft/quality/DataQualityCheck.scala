package graft.quality

import org.apache.spark.sql.DataFrame

import graft.ops.Profiles

/** Schema-driven post-load data-quality check (reference
  * `utils/data_quality.py:4-64`): introspect the table schema, emit one
  * null-count per column in a single aggregate, then a rule-based
  * assessment (the reference's Gemini call falls back to exactly this kind
  * of threshold text; no LLM in the engine path).
  *
  * API parity: `check_data_quality(project, dataset, table)` →
  * [[DataQualityCheck.check]] on the loaded DataFrame.
  */
final case class QualityReport(
    table: String, totalRows: Long, nullCounts: Map[String, Long],
    worstColumn: Option[(String, Double)], assessment: String)

object DataQualityCheck {

  def check(df: DataFrame, table: String, warnNullPct: Double = 5.0): QualityReport = {
    val cols = df.schema.fieldNames.toSeq
    val row = Profiles.nullProfile(df).head()
    val total = row.getLong(0)
    val nulls = cols.zipWithIndex.map { case (c, i) => c -> row.getLong(i + 1) }.toMap
    val worst =
      if (total == 0) None
      else nulls.maxByOption(_._2).map { case (c, n) => (c, n.toDouble * 100 / total) }
    val assessment = worst match {
      case _ if total == 0 => s"FAIL: $table is empty"
      case Some((c, pct)) if pct > warnNullPct =>
        f"WARN: $table column '$c' has $pct%.1f%% nulls (threshold $warnNullPct%.1f%%)"
      case _ => s"PASS: $table null rates within threshold across ${cols.size} columns"
    }
    QualityReport(table, total, nulls, worst, assessment)
  }
}
