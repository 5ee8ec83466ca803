package graft.tools

import org.apache.spark.sql.DataFrame

/** Diagnostic probe for the ANN serving steady state (q75-q77): separates
  * the WARM-page-cache serving figure the bench reports from the COLD one
  * a capacity plan also wants (first query against artifacts nothing has
  * read yet — e.g. right after a deploy or on a node that didn't train).
  *
  * Protocol per serving query: one untimed warm pass (publishes artifacts
  * if absent, compiles codegen, JITs, and pulls the artifact bytes into
  * the OS page cache), then `--reps` timed warm passes, then for each rep
  * an optional `--flush` shell command (e.g.
  * `sync; echo 3 > /proc/sys/vm/drop_caches`, needs privileges) followed
  * by a timed pass — same JVM, so the cold number isolates the physical
  * artifact read, not process startup. Caches are cleared between passes
  * so Spark-side reuse can't shortcut a pass.
  *
  * Not part of the driver contract; run via
  * `sbt 'runMain graft.tools.ServeProbe [--flush CMD] [--reps N]'`.
  * Prints one JSON line per query plus a summary line. */
object ServeProbe {

  private val ServingQueries =
    Seq("q75_ivf_search_serving", "q76_pq_search_serving",
      "q77_ivfpq_search_serving")

  def main(args: Array[String]): Unit = {
    // sbt's runMain argument splitting mangles quoted shell commands, so
    // the flush command can also arrive via SPARK_GRAFT_FLUSH_CMD
    var flushCmd: Option[String] = sys.env.get("SPARK_GRAFT_FLUSH_CMD")
    var reps = 3
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--flush" if i + 1 < args.length => flushCmd = Some(args(i + 1)); i += 2
        case "--reps" if i + 1 < args.length => reps = args(i + 1).toInt; i += 2
        case other => sys.error(s"unknown arg '$other'; usage: ServeProbe [--flush CMD] [--reps N]")
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.core.Sessions.local(cpus)

    def timed(df: => DataFrame): Double = {
      val s0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - s0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      dt
    }
    def flush(): Unit = flushCmd.foreach { cmd =>
      val rc = scala.sys.process.Process(Seq("sh", "-c", cmd)).!
      if (rc != 0) sys.error(s"flush command failed (rc $rc): $cmd")
    }

    val rows = ServingQueries.map { name =>
      val fn = graft.SparkEntry.queries(name)
      timed(fn(spark, sfDir)) // untimed-in-spirit warm pass (discarded)
      val warm = (1 to reps).map(_ => timed(fn(spark, sfDir)))
      val cold = flushCmd.toSeq.flatMap { _ =>
        (1 to reps).map { _ => flush(); timed(fn(spark, sfDir)) }
      }
      def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
      val coldPart =
        if (cold.isEmpty) ""
        else f""","cold_min":${cold.min}%.3f,"cold":${fmt(cold)}"""
      println(s"""{"query":${graft.SparkEntry.jsonString(name)},""" +
        f""""warm_min":${warm.min}%.3f,"warm":${fmt(warm)}$coldPart}""")
      (name, warm.min, if (cold.isEmpty) None else Some(cold.min))
    }
    val summary = rows.map { case (n, w, c) =>
      val short = n.takeWhile(_ != '_')
      c match {
        case Some(cv) => f"$short warm ${w}%.2fs cold ${cv}%.2fs (${cv / w}%.1fx)"
        case None => f"$short warm ${w}%.2fs"
      }
    }.mkString("; ")
    println(s"serve-probe: $summary")
    spark.stop()
  }
}
