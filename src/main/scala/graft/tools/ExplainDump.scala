package graft.tools

/** Dumps `.explain("formatted")` for registry queries to files — the r19
  * optimization round's plan-evidence capture (the judge checks plan claims
  * against `plans/r19/<query>_{before,after}.txt`).
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <qprefix>[,<qprefix>...]
  * e.g. runMain graft.tools.ExplainDump plans/r19 before q42,q98
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ExplainDump <outDir> <suffix> <qprefixes>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val prefixes = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local(cpus)
    val all = graft.SparkEntry.all
    prefixes.foreach { p =>
      val hits = all.keys.filter(_.startsWith(p)).toSeq.sorted
      require(hits.nonEmpty, s"no registry query matches prefix '$p'")
      hits.foreach { name =>
        val df = all(name).spark(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val f = outDir.resolve(s"${name.takeWhile(_ != '_')}_$suffix.txt")
        java.nio.file.Files.writeString(f, s"== $name ($sfDir) ==\n" + plan)
        println(s"[explain] wrote $f (${plan.length} chars)")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
