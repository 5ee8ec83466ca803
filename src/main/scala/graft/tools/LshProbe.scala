package graft.tools

import graft.ext.Similarity

/** Scratch probe: measures nearDupPairsLsh candidate volume + wall time
  * across explicit (planes, tables) depths at a given SF, to validate the
  * lshParams cost proxy against measured reality in the LOOSE regime.
  * Not part of the driver contract; run via
  * `sbt "runMain graft.tools.LshProbe"`. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.core.Sessions.local(cpus)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    println(s"corpus n=$n")
    // current auto sizing at targetRecall 0.999
    val (autoP, autoT) = Similarity.lshParams(n, 0.45, targetRecall = 0.999)
    println(s"auto sizing: planes=$autoP tables=$autoT")
    // the registry's exact auto path (emb.count() + auto sizing inside)
    val autoTimes = (1 to 2).map { _ =>
      val s0 = System.nanoTime()
      Similarity.nearDupPairsLsh(emb, 0.45, targetRecall = 0.999)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - s0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      dt
    }
    println(f"auto-path fullTime=${autoTimes.min}%6.2f (samples ${autoTimes.map(x => f"$x%.2f").mkString(",")})")
    val configs = Seq((autoP, autoT)) ++ Seq(4, 5, 6, 7).map { k =>
      // recall-solving table count at depth k — the engine's own formula,
      // so the probe measures configs lshParams would actually produce
      (k, Similarity.lshTablesFor(k, 0.45, targetRecall = 0.999))
    }
    for ((k, t) <- configs.distinct if t <= 64) {
      // candidate volume (after cross-table distinct)
      var t0 = System.nanoTime()
      val cand = Similarity.lshCandidates(emb, k, t).count()
      val tCand = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      // full query through the bench's noop sink (keeps the final sort and
      // the full rerank projection — count() would prune both), min of 2
      val rows = Similarity.nearDupPairsLsh(emb, 0.45, nPlanes = k, nTables = t)
        .count()
      spark.sharedState.cacheManager.clearCache()
      val times = (1 to 2).map { _ =>
        val s0 = System.nanoTime()
        Similarity.nearDupPairsLsh(emb, 0.45, nPlanes = k, nTables = t)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - s0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        dt
      }
      val best = times.min
      println(f"planes=$k%2d tables=$t%3d candidates=$cand%9d pairs=$rows%4d candTime=$tCand%6.2f fullTime=$best%6.2f")
    }
    spark.stop()
  }
}
