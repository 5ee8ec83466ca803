package graft.tools

import graft.core.Catalog
import graft.pipeline.TransformJob

/** CLI parity with the reference transform job
  * (`scripts/transform_script:28-35`: `--project_id --input_table
  * --output_table`): runs read → transform → overwrite-write under the
  * self-healing wrapper, so a seeded double-dot input reference is
  * classified, patched, and retried.
  *
  *   sbt "runMain graft.tools.TransformMain --data_root /tmp/graft \
  *        --input_table selfhealing..employee_data --output_table output.employee_data"
  */
object TransformMain {
  def main(args: Array[String]): Unit = {
    // strict flag/value pairing: a bare token or valueless flag fails
    // loudly instead of shifting alignment and silently consuming the
    // next flag name as a value
    val opts = args.grouped(2).map {
      case Array(k, v) if k.startsWith("--") && !v.startsWith("--") =>
        k.drop(2) -> v
      case other => sys.error(s"malformed arguments near '${other.mkString(" ")}' — " +
        "usage: --data_root <dir> --input_table <ns.table> --output_table <ns.table>")
    }.toMap
    val root = opts.getOrElse("data_root", sys.error("--data_root required"))
    val input = opts.getOrElse("input_table", sys.error("--input_table required"))
    val output = opts.getOrElse("output_table", sys.error("--output_table required"))

    val spark = graft.core.Sessions.local(8)
    try {
      val catalog = new Catalog(spark, root)
      val (rows, attempts) = new TransformJob(catalog).runHealed(input, output)
      attempts.foreach { a =>
        System.err.println(
          s"[heal] attempt ${a.attempt}: ${a.classification.errorType} -> " +
            s"${a.classification.suggestedFix} (healed=${a.healed})")
      }
      val j = (s: String) => graft.SparkEntry.jsonString(s)
      println(s"""{"input":${j(input)},"output":${j(output)},"rows":$rows,"healing_attempts":${attempts.size}}""")
    } finally spark.stop()
  }
}
