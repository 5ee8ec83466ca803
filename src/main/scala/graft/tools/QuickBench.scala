package graft.tools

/** Times a SUBSET of registry queries with the Bench methodology (noop sink,
  * min-of-N, cache cleared between samples) — the r19 optimization round's
  * inner measurement loop. NOT the official artifact: the driver-contract
  * numbers stay graft.Bench's.
  * Usage: runMain graft.tools.QuickBench <qprefix>[,<qprefix>...] [passes]
  */
object QuickBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QuickBench <qprefixes> [passes]")
    val prefixes = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val passes = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local(cpus)
    val all = graft.SparkEntry.all
    val names = prefixes.flatMap(p => all.keys.filter(_.startsWith(p))).distinct.sorted
    require(names.nonEmpty, "no matching queries")
    val results = (1 to passes).map { pass =>
      names.map { name =>
        val t0 = System.nanoTime()
        all(name).spark(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        name -> dt
      }.toMap
    }
    names.foreach { n =>
      val ss = results.map(_(n))
      println(f"[quickbench] $n%-45s min ${ss.min}%6.2f s  (samples ${ss.map(s => f"$s%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
