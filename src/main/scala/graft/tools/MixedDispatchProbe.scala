package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal}

/** End-to-end scale cell for the mixed-modality dispatcher (r18 — the
  * capstone the r17 verdict asked for): per-codec throughput was measured
  * piecewise (SCALE.md r17/r18), but `runPlanByKind` as ONE call over a
  * mixed corpus had no cell. This probe builds a ~N-row corpus spanning
  * every container the dispatcher routes (png/jpeg/gif/bmp images, wav/
  * G.711/flac audio, mp4 + MJPEG-AVI video, garbage rows), then measures:
  *
  *  1. the SPLIT cost — the single scan-side header parse that buckets
  *     rows by detected kind (the dispatcher's only added stage);
  *  2. the one-call `runPlanByKind` wall end to end;
  *  3. the SUM of direct per-modality calls over the same pools — the
  *     dispatcher's claim is per-kind equality at ~zero overhead, so the
  *     gap between 2 and 3 (beyond the split) is the honest price of the
  *     one-call convenience;
  *  4. per-pool survivor-set equality between the two (the ExtSpec pin,
  *     re-asserted at scale).
  *
  * `sbt 'runMain graft.tools.MixedDispatchProbe [--size N]'` — one JSON
  * line. Corpus mix: 40% images / 25% audio / 25% video (3:2 avi:mp4) /
  * 10% garbage, the planted-dup structure of every family's own corpus.
  */
object MixedDispatchProbe {

  def main(args: Array[String]): Unit = {
    var size = 1000000L
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--size" if i + 1 < args.length => size = args(i + 1).toLong; i += 2
        case other => sys.error(
          s"unknown arg '$other'; usage: MixedDispatchProbe [--size N]")
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.core.Sessions.local(cpus)
    import spark.implicits._

    def docs(n: Long) = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("body "), col("id").cast("string")).as("text"),
      lit("web").as("source"), lit(10L).as("n_chars"))

    val nImg = size * 40 / 100
    val nAud = size * 25 / 100
    val nAvi = size * 15 / 100
    val nMp4 = size * 10 / 100
    val nJunk = size - nImg - nAud - nAvi - nMp4
    val mixed = Multimodal.syntheticImages(docs(nImg))
      .unionByName(Multimodal.syntheticAudio(docs(nAud))
        .withColumn("media_id", col("media_id") + size)
        .select("media_id", "payload"))
      .unionByName(Multimodal.syntheticVideoAvi(docs(nAvi))
        .withColumn("media_id", col("media_id") + 2 * size)
        .select("media_id", "payload"))
      .unionByName(Multimodal.syntheticVideo(docs(nMp4))
        .withColumn("media_id", col("media_id") + 3 * size)
        .select("media_id", "payload"))
      .unionByName(spark.range(nJunk)
        .select((col("id") + 4 * size).as("media_id"),
          concat(lit("garbage payload "), col("id").cast("string"))
            .cast("binary").as("payload")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = mixed.count()
    val payloadMb = mixed.agg(sum(length(col("payload")))).first().getLong(0) / 1e6

    // ── 1. the split cost: ONE header parse per row, kinds counted ──
    val t0 = System.nanoTime()
    val kindCounts = mixed.withColumn("__kind",
        graft.functions.MediaHeader(col("payload")).getField("format"))
      .groupBy("__kind").count().collect()
      .map(r => (if (r.isNullAt(0)) "null" else r.getString(0)) -> r.getLong(1))
      .toMap
    val dtSplit = (System.nanoTime() - t0) / 1e9

    // ── 2. the direct per-modality calls over the pools ──
    val t2 = System.nanoTime()
    val imgPool = mixed.filter(col("media_id") < size)
    val pImg = Dedup.plan(Multimodal.imageFingerprints(imgPool),
      mutationTolerance = 0.01, modality = "image", hasEmbeddings = false)
    val dropImg = Dedup.runPlan(pImg, Multimodal.imageFingerprints(imgPool),
      idCol = "media_id").filter(col("dup_of").isNotNull).count()
    val audPool = mixed.filter(col("media_id") >= size &&
      col("media_id") < 2 * size)
    val featsAud = Multimodal.audioEnvelopeFeatures(audPool)
    val pAud = Dedup.plan(featsAud, mutationTolerance = 0.01,
      modality = "audio", hasEmbeddings = false, vecCol = "feature")
    val dropAud = Dedup.runPlan(pAud, featsAud, idCol = "media_id",
      vecCol = "feature").filter(col("dup_of").isNotNull).count()
    val vidPool = mixed.filter(col("media_id") >= 2 * size &&
      col("media_id") < 4 * size)
    val pVid = Dedup.plan(vidPool, mutationTolerance = 0.0001,
      modality = "video", hasEmbeddings = false)
    val dropVid = Dedup.runPlan(pVid, vidPool, idCol = "media_id",
      textCol = "payload").filter(col("dup_of").isNotNull).count()
    val dtDirect = (System.nanoTime() - t2) / 1e9

    // ── 3. the one-call dispatch (measured AFTER the direct pass so
    // neither side pays the cold-cache/JIT warmup alone) ──
    val t1 = System.nanoTime()
    val byKind = Dedup.runPlanByKind(mixed, mutationTolerance = 0.01)
    val survByKind = byKind.filter(col("dup_of").isNotNull)
      .groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dtOneCall = (System.nanoTime() - t1) / 1e9

    // ── 4. per-pool elimination-count equality (the ExtSpec pin's
    // cheap at-scale form; the full per-id equality is spec-pinned) ──
    val imgKinds = Seq("png", "jpeg", "gif", "bmp")
    val oneCallImg = imgKinds.map(k => survByKind.getOrElse(k, 0L)).sum
    val oneCallAud = Seq("wav", "flac").map(k => survByKind.getOrElse(k, 0L)).sum
    val oneCallVid = Seq("mp4", "avi").map(k => survByKind.getOrElse(k, 0L)).sum
    val equal = oneCallImg == dropImg && oneCallAud == dropAud &&
      oneCallVid == dropVid

    byKind.unpersist()
    println(f"""{"check":"mixed_dispatch","rows":$total,""" +
      f""""payload_mb":$payloadMb%.1f,"kinds":${kindCounts.size},""" +
      f""""split_s":$dtSplit%.3f,"one_call_s":$dtOneCall%.3f,""" +
      f""""direct_sum_s":$dtDirect%.3f,""" +
      f""""overhead":${dtOneCall / dtDirect}%.3f,""" +
      f""""drops_image":$oneCallImg,"drops_audio":$oneCallAud,""" +
      f""""drops_video":$oneCallVid,"direct_image":$dropImg,""" +
      f""""direct_audio":$dropAud,"direct_video":$dropVid,""" +
      f""""pools_equal":$equal}""")
    mixed.unpersist()
    spark.stop()
  }
}
