package graft.tools


/** Plan-audit helper: prints the formatted physical plan of selected
  * registry queries so scan pushdown, broadcast choices, and whole-stage
  * codegen spans can be reviewed (`sbt "runMain graft.tools.Explain q10 ..."`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // shared session factory: the printed plans must be the plans the
    // production confs (join threshold, AQE) actually produce
    val spark = graft.core.Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.isEmpty) Seq("q10_revenue_zscore") else args.toSeq
    graft.SparkEntry.all.toSeq.sortBy(_._1).foreach { case (name, d) =>
      if (wanted.exists(name.startsWith)) {
        println(s"\n========== $name ==========")
        d.spark(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
