package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** Measured detection-vs-mutation sweep for the IMAGE dedup family — the
  * r12 text sweep's posture applied to dHash: how much pixel-level churn
  * can the radius-3 Manku-blocked perceptual pairing still catch? The
  * numbers this prints are what `Dedup.recommendFamily(modality="image")`
  * encodes (SCALE.md r15) — selection logic quotes measurements, never
  * guesses.
  *
  * Corpus: the `Multimodal.syntheticImages` pattern generator at 32×32,
  * with every id%20==1 image rendering its PREDECESSOR's pattern at a
  * parameterized mutation — `round(m · w · h)` deterministic single-pixel
  * jitters (XOR 0x14, the corpus's standard perturbation) plus the +8
  * uniform brightness shift (which dHash is exactly invariant to, so the
  * sweep measures the JITTER response alone). True pairs = n/20 exactly,
  * at every size and mutation.
  *
  * `sbt 'runMain graft.tools.ImageDedupProbe [--size N]
  * [--mutations 0.001,0.01,...] [--radius H] [--blocks B]'`
  * — one JSON line per mutation level: planted detection, total pairs,
  * leakage (pairs beyond the planted ones — all still genuine radius
  * pairs, the verify is exact), and wall seconds.
  */
object ImageDedupProbe {

  /** Parametrized twin corpus: (media_id, payload) PNGs where dup twins
    * jitter `jitters` pixels of the predecessor's pattern. Partition-local
    * generation, nothing collected — `syntheticImages`' batch shape with
    * the mutation knob exposed. */
  def corpus(spark: SparkSession, n: Long, jitters: Int,
      w: Int = 32, h: Int = 32): DataFrame = {
    val rdd = spark.range(n).select(col("id").as("doc_id")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val isDup = java.lang.Math.floorMod(id, 20L) == 1L
        val seed = if (isDup) id - 1 else id
        val pix = Multimodal.patternPixels(seed, w, h)
        if (isDup) {
          var i = 0
          while (i < pix.length) { pix(i) = ((pix(i) & 0xff) + 8).toByte; i += 1 }
          var j = 0
          while (j < jitters) {
            // distinct deterministic positions: a stride coprime to w·h
            // (w·h = 1024, 31 is odd) walks all cells before repeating
            val p = (java.lang.Math.floorMod(id * 31L + j * 131L, (w * h).toLong)).toInt
            pix(p) = ((pix(p) & 0xff) ^ 0x14).toByte
            j += 1
          }
        }
        Row(id, graft.functions.PngGray.encodeGray(w, h, pix))
      }
    }
    spark.createDataFrame(rdd, Multimodal.imageSchema)
  }

  /** Shift/crop twin corpus for the GEOMETRIC sweep: every image is a
    * 32×32 window into a 40×40 field; dup twins crop at offset
    * (shift, shift) instead of (0, 0) — same content, misaligned against
    * the 9×8 box grid, the transform class the jitter sweep cannot see. */
  def cropCorpus(spark: SparkSession, n: Long, shift: Int,
      w: Int = 32, h: Int = 32): DataFrame = {
    val big = 40
    require(shift >= 0 && shift + math.max(w, h) <= big, s"bad shift $shift")
    val rdd = spark.range(n).select(col("id").as("doc_id")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val isDup = java.lang.Math.floorMod(id, 20L) == 1L
        val seed = if (isDup) id - 1 else id
        val field = Multimodal.patternPixels(seed, big, big)
        val off = if (isDup) shift else 0
        val pix = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            pix(y * w + x) = field((y + off) * big + (x + off))
            x += 1
          }
          y += 1
        }
        Row(id, graft.functions.PngGray.encodeGray(w, h, pix))
      }
    }
    spark.createDataFrame(rdd, Multimodal.imageSchema)
  }

  def main(args: Array[String]): Unit = {
    var size = 200000L
    var mutations = Seq(0.001, 0.005, 0.01, 0.02, 0.05, 0.10)
    var radius = 3
    var blocks = 0
    var survivors = false
    var cropShifts: Seq[Int] = Nil
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--size" if i + 1 < args.length => size = args(i + 1).toLong; i += 2
        case "--mutations" if i + 1 < args.length =>
          mutations = args(i + 1).split(",").map(_.toDouble).toSeq; i += 2
        case "--radius" if i + 1 < args.length => radius = args(i + 1).toInt; i += 2
        case "--blocks" if i + 1 < args.length => blocks = args(i + 1).toInt; i += 2
        case "--survivors" => survivors = true; i += 1
        case "--cropSweep" if i + 1 < args.length =>
          cropShifts = args(i + 1).split(",").map(_.toInt).toSeq; i += 2
        case other => sys.error(s"unknown arg '$other'; usage: ImageDedupProbe " +
          "[--size N] [--mutations 0.01,..] [--radius H] [--blocks B] " +
          "[--survivors] [--cropSweep 1,2,4]")
      }
    }
    if (cropShifts.nonEmpty) {
      // the GEOMETRIC sweep: detection of shift-cropped twins — the
      // transform class where dHash's box grid misaligns and radius-3
      // detection is expected to collapse (the honest boundary of the
      // perceptual-fingerprint family; the embedding tier's job past it)
      val cpus0 = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
      val spark0 = graft.core.Sessions.local(cpus0)
      cropShifts.foreach { s =>
        val t0 = System.nanoTime()
        val fps = Multimodal.imageFingerprints(cropCorpus(spark0, size, s))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val detected = Multimodal.imageNearDups(fps, radius, blocks)
          .filter(col("media_b") === col("media_a") + 1 &&
            pmod(col("media_b"), lit(20)) === 1)
          .count()
        // median planted-pair hamming, computed exhaustively from the
        // fingerprints (pair-local, no mining) — locates the twins
        // relative to the radius even when detection is ~0
        val hams = fps.select(col("media_id"), col("dhash"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val planted = (0L until size by 20L).flatMap { base =>
          for (a <- hams.get(base); b <- hams.get(base + 1))
            yield java.lang.Long.bitCount(a ^ b)
        }.sorted
        val med = if (planted.isEmpty) -1 else planted(planted.size / 2)
        val dt = (System.nanoTime() - t0) / 1e9
        fps.unpersist()
        spark0.sharedState.cacheManager.clearCache()
        println(f"""{"check":"image_crop_detection","rows":$size,"shift":$s,""" +
          f""""radius":$radius,"detected":$detected,"true_dups":${size / 20},""" +
          f""""detection":${detected.toDouble / (size / 20)}%.4f,""" +
          f""""median_planted_hamming":$med,"wall_s":$dt%.3f}""")
      }
      spark0.stop()
      return
    }
    require(size > 0 && mutations.nonEmpty && mutations.forall(m => m >= 0 && m <= 1),
      s"bad knobs: size=$size mutations=$mutations")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.core.Sessions.local(cpus)
    val wh = 32 * 32
    if (survivors) {
      // SURVIVOR-oriented image dedup — the head-mass cell for the fourth
      // family: the synthetic pattern corpus is deliberately LOW-DIVERSITY
      // (48 frequency classes), so its genuine radius-pair mass is
      // quadratic-ish in n (61.5M pairs at 200k docs) — exactly the
      // corpus shape where a pair-path dedup drowns and the greedy star's
      // ~members×promoted-reps work is the point. Reports the block-cell
      // popcount mass the pair path would collapse, the walk's actual
      // comparisons, survivors, and planted-dup detection.
      mutations = mutations.take(1)
      val m = mutations.head
      val jitters = math.max(1, math.round(m * wh).toInt)
      val fps = Multimodal.imageFingerprints(corpus(spark, size, jitters))
        .filter(col("dhash").isNotNull)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val blockTable = graft.ext.Dedup.simhashBlockTable(
        fps, "media_id", "dhash", radius,
        if (blocks == -1) graft.ext.Dedup.simhashParams(size, radius)._1 else blocks)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mass = blockTable.groupBy("bkey", "blk", "bits").count()
        .agg(sum(col("count") * (col("count") - lit(1L))).as("m2"))
        .first().getLong(0) / 2
      val cmp = spark.sparkContext.longAccumulator("image_star_comparisons")
      val t0 = System.nanoTime()
      val assign = graft.ext.Dedup.simhashAssignFromBlocks(blockTable,
        "media_id", comparisons = Some(cmp))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val surv = assign.filter(col("dup_of").isNull).count()
      val detected = assign.filter(col("dup_of").isNotNull &&
        pmod(col("media_id"), lit(20)) === 1).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"check":"image_survivors","rows":$size,"mutation":$m,""" +
        f""""radius":$radius,"raw_pair_mass":$mass,"comparisons":${cmp.value},""" +
        f""""survivors":$surv,"eliminated":${size - surv},"detected":$detected,""" +
        f""""true_dups":${size / 20},"wall_s":$dt%.3f}""")
      assign.unpersist(); blockTable.unpersist(); fps.unpersist()
      spark.stop()
      return
    }
    mutations.foreach { m =>
      val jitters = math.max(1, math.round(m * wh).toInt)
      val t0 = System.nanoTime()
      // fingerprints persist (both self-join sides read them), pairs once
      val fps = Multimodal.imageFingerprints(corpus(spark, size, jitters))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = Multimodal.imageNearDups(fps, radius, blocks)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val total = pairs.count()
      val detected = pairs
        .filter(col("media_b") === col("media_a") + 1 &&
          pmod(col("media_b"), lit(20)) === 1)
        .count()
      val errs = fps.filter(col("error").isNotNull).count()
      val dt = (System.nanoTime() - t0) / 1e9
      pairs.unpersist(); fps.unpersist()
      spark.sharedState.cacheManager.clearCache()
      val truth = size / 20
      println(f"""{"check":"image_detection","rows":$size,"mutation":$m,""" +
        f""""jitters":$jitters,"radius":$radius,"blocks":$blocks,""" +
        f""""detected":$detected,"true_dups":$truth,""" +
        f""""detection":${detected.toDouble / truth}%.4f,"pairs":$total,""" +
        f""""decode_errors":$errs,"wall_s":$dt%.3f}""")
    }
    spark.stop()
  }
}
