package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity}

/** Operator-level plan evidence for the r20 restructurings. The
  * registry-level `ExplainDump` only shows an artifact query's FINAL
  * stage (the changed operators run as side-effect `cat.save`s during
  * construction), so this dumps the changed operators' plans directly —
  * both the NEW shape and the OLD composition, which remains expressible
  * through the unchanged public API (`nearDupPairsLsh` → per-media max;
  * `nearDupAssign`/`simhashAssignFromBlocks` under the wrapper's
  * completion join), so both come from the same binary and the diff is
  * purely the restructuring. Measurement-only.
  * Usage: runMain graft.tools.R20PlanDump <outDir>
  */
object R20PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args.headOption.getOrElse("plans/r20"))
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local(cpus)

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = outDir.resolve(s"$name.txt")
      java.nio.file.Files.writeString(f, s"== $name ($sfDir) ==\n" + plan)
      println(s"[r20plan] wrote $f (${plan.length} chars)")
      spark.sharedState.cacheManager.clearCache()
    }

    val cat = new graft.core.Catalog(spark,
      s"/tmp/graft_ann/${new java.io.File(sfDir).getName}")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // ── q97/q98 pairs stage: old distinct-first vs new aggregate-form ──
    cat.save(Multimodal.audioSegmentFeatures(
      Multimodal.syntheticAudio(docs, samplesPerClip = 4096),
      segmentSamples = 2048, segments = 2, descriptor = "spectral"),
      "media.r20plan_segs")
    val segs = cat.load("media.r20plan_segs")
    val packed = segs.filter(col("feature").isNotNull)
      .select((shiftleft(col("media_id"), 6) + col("segment_idx")).as("fid"),
        col("feature"))
    dump("q98pairs_old_distinct_first",
      Similarity.nearDupPairsLsh(packed, 0.9, idCol = "fid",
          vecCol = "feature")
        .select(shiftright(col("id_a"), 6).as("media_a"),
          shiftright(col("id_b"), 6).as("media_b"), col("cosine_sim"))
        .filter(col("media_a") =!= col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(max(col("cosine_sim")).as("best_cosine")))
    dump("q98pairs_new_aggregate_form",
      Multimodal.audioAnySegmentNearDups(segs, threshold = 0.9))

    // ── q95 pairing stage: old distinct-first vs new aggregate-form ──
    cat.save(Multimodal.videoFrameFingerprints(
      Multimodal.syntheticVideoAvi(docs)), "media.r20plan_vfps")
    val vfps = cat.load("media.r20plan_vfps")
    val vpacked = vfps.filter(col("dhash").isNotNull)
      .select((shiftleft(col("media_id"), 6) + col("frame_idx")).as("fid"),
        col("dhash"))
    dump("q95pairs_old_distinct_first",
      Dedup.simhashPairsFromSigs(vpacked, "fid", "dhash", maxHamming = 3)
        .select(shiftright(col("doc_a"), 6).as("media_a"),
          shiftright(col("doc_b"), 6).as("media_b"), col("hamming"))
        .filter(col("media_a") =!= col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(min(col("hamming")).cast("long").as("min_hamming")))
    dump("q95pairs_new_aggregate_form",
      Multimodal.videoAnyFrameNearDups(vfps, maxHamming = 3))

    // ── q84 assign stage: old assignment-join vs eliminations join ──
    cat.save(Multimodal.imageFingerprints(Multimodal.syntheticImages(docs)),
      "media.r20plan_fps")
    val fps = cat.load("media.r20plan_fps")
    dump("q84assign_old_completion_join",
      fps.select(col("media_id"))
        .join(Dedup.simhashAssignFromBlocks(
          Dedup.simhashBlockTable(fps.filter(col("dhash").isNotNull),
            "media_id", "dhash", maxHamming = 3), "media_id"),
          Seq("media_id"), "left_outer"))
    dump("q84assign_new_eliminations_join",
      Multimodal.imageAssign(fps, maxHamming = 3))

    // ── q89 assign stage: same pair for the LSH walk family ──
    cat.save(Multimodal.audioSpectralFeatures(
      Multimodal.syntheticAudio(docs)), "media.r20plan_afeats")
    val feats = cat.load("media.r20plan_afeats")
    dump("q89assign_old_completion_join",
      feats.select(col("media_id"))
        .join(Similarity.nearDupAssign(feats.filter(col("feature").isNotNull),
          0.9, idCol = "media_id", vecCol = "feature"),
          Seq("media_id"), "left_outer"))
    dump("q89assign_new_eliminations_join",
      Multimodal.audioFeatureAssign(feats, threshold = 0.9))

    spark.stop()
  }
}
