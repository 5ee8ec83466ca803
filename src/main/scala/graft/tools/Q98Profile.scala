package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{Multimodal, Similarity}

/** Stage-timing probe for the q97/q98 any-segment audio tier (r19
  * optimization round): times each stage of the query in isolation so the
  * optimization targets the measured cost, not the guessed one.
  * Usage: runMain graft.tools.Q98Profile <sfDir> [descriptor]
  */
object Q98Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val descriptor = if (args.length > 1) args(1) else "spectral"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local(cpus)
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[q98profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val cat = new graft.core.Catalog(spark, s"/tmp/graft_ann/${new java.io.File(sfDir).getName}")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"))
    println(s"[q98profile] docs=${docs.count()}")

    val audio = Multimodal.syntheticAudio(docs, samplesPerClip = 4096)
    timed("1. syntheticAudio only (noop)") {
      audio.write.format("noop").mode("overwrite").save()
    }
    val segs0 = Multimodal.audioSegmentFeatures(audio,
      segmentSamples = 2048, segments = 2, descriptor = descriptor)
    timed("2. gen+segmentFeatures (noop)") {
      segs0.write.format("noop").mode("overwrite").save()
    }
    timed("3. gen+features+save parquet") {
      cat.save(segs0, "media.q98p_segs")
    }
    val segs = cat.load("media.q98p_segs")
    val packed = segs.filter(col("feature").isNotNull)
      .select((shiftleft(col("media_id"), 6) + col("segment_idx")).as("fid"),
        col("feature"))
    val n = timed("4. count packed")(packed.count())
    println(s"[q98profile] packed rows=$n")
    val (planes, tables) = Similarity.lshParams(n, 0.9, 0.98)
    println(s"[q98profile] lshParams planes=$planes tables=$tables")
    val bk = Similarity.lshTable(packed, planes, tables, idCol = "fid",
      vecCol = "feature")
    timed("5. lshTable build (noop)") {
      bk.write.format("noop").mode("overwrite").save()
    }
    val bkP = bk.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rawCnt = timed("6. raw self-join count") {
      val a = bkP.select(col("ckey"), col("tbl").as("tbl_a"),
        col("bucket").as("bucket_a"), col("fid").as("id_a"))
      val b = bkP.select(col("ckey").as("ckey_b"), col("tbl").as("tbl_b"),
        col("bucket").as("bucket_b"), col("fid").as("id_b"))
      a.join(b, col("ckey") === col("ckey_b") &&
          col("tbl_a").bitwiseXOR(col("tbl_b")) === lit(0) &&
          col("bucket_a").bitwiseXOR(col("bucket_b")) === lit(0L) &&
          col("id_a") < col("id_b"))
        .select("id_a", "id_b").count()
    }
    println(s"[q98profile] raw candidate rows=$rawCnt")
    val cand = Similarity.lshCandidatesFromTable(bkP, idCol = "fid")
    val candCnt = timed("7. distinct candidates count")(cand.count())
    println(s"[q98profile] distinct candidate pairs=$candCnt")
    spark.sharedState.cacheManager.clearCache()
    val lshPairs = Similarity.nearDupPairsLsh(packed, 0.9, idCol = "fid",
      vecCol = "feature", targetRecall = 0.98)
    timed("8a. nearDupPairsLsh (noop)") {
      lshPairs.write.format("noop").mode("overwrite").save()
    }
    println("[q98profile] pairs plan:\n" + lshPairs.queryExecution.executedPlan
      .toString.linesIterator.take(30).mkString("\n"))
    spark.sharedState.cacheManager.clearCache()
    timed("8. full anySegment pairs + save") {
      cat.save(Multimodal.audioAnySegmentNearDups(segs, threshold = 0.9),
        "media.q98p_pairs")
    }
    spark.sharedState.cacheManager.clearCache()
    val f = segs.filter(col("feature").isNotNull)
    timed("9. final exact-recompute join (noop)") {
      cat.load("media.q98p_pairs").select("media_a", "media_b")
        .join(f.select(col("media_id").as("media_a"),
          col("feature").as("f_a")), Seq("media_a"))
        .join(f.select(col("media_id").as("media_b"),
          col("feature").as("f_b")), Seq("media_b"))
        .groupBy("media_a", "media_b")
        .agg(round(max(Similarity.cosine(col("f_a"), col("f_b"))), 6)
          .as("best_cosine"))
        .withColumn("sound",
          col("best_cosine") > 0.9 && col("media_a") < col("media_b"))
        .orderBy("media_a", "media_b")
        .write.format("noop").mode("overwrite").save()
    }
    val pairs = cat.load("media.q98p_pairs").count()
    println(s"[q98profile] final pair rows=$pairs")
    spark.stop()
  }
}
