package graft

/** Structural audit of every registry query's physical plan at sf0.001 —
  * the guard that keeps "no accidental quadratic plans" true as the
  * registry grows. Builds each plan (no job execution; the parquet scan is
  * only analyzed) and rejects CartesianProduct everywhere, allowing
  * BroadcastNestedLoopJoin only for the queries that intentionally
  * broadcast a ONE-ROW side (single-query-vector similarity scans, scalar
  * CTE combines) — a 1-row BNLJ is a map-side probe, not a pair blow-up.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // 1-row-broadcast probes: exact top-k / ANN / IVF against a single query
  // vector, and scalar-CTE cross joins — BNLJ with a 1-row build side
  private val oneRowBroadcastOk = Set(
    "q10_revenue_zscore", "q13_same_hour_baseline", "q20_quality_cross",
    "q31_embedding_cosine_topk", "q32_ann_lsh_topk", "q39_approx_distinct",
    "q43_ivf_topk")

  test("no registry query plans a CartesianProduct; BNLJ only on 1-row probes") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
        !oneRowBroadcastOk.contains(name)
      if (cartesian || bnlj)
        Some(s"$name: cartesian=$cartesian unexpectedBnlj=$bnlj")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
