package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{Multimodal, Similarity}

/** Stage-timing probe for the survivor/assign witnesses (q81/q84/q86/q89)
  * — r20 optimization round. Times generation, feature scan+save, the
  * assign walk, and the final soundness join separately, each stage run
  * `passes` times (min reported) so cold-codegen cost does not masquerade
  * as stage cost. Measurement-only: writes to its own q??p_* scratch
  * tables, never on a bench or Verify path.
  * Usage: runMain graft.tools.AssignProfile <sfDir> <family> [passes]
  *   family: image | spectral | audio | twin
  */
object AssignProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val family = if (args.length > 1) args(1) else "audio"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local(cpus)

    def timed(label: String)(f: => Unit): Unit = {
      val ss = (1 to passes).map { _ =>
        spark.sparkContext.setJobDescription(label)
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        dt
      }
      println(f"[assignprofile] $family/$label%-38s min ${ss.min}%6.2f s  (${ss.map(s => f"$s%.2f").mkString(", ")})")
    }

    val cat = new graft.core.Catalog(spark,
      s"/tmp/graft_ann/${new java.io.File(sfDir).getName}")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    family match {
      case "image" => // q84 shape
        val imgs = Multimodal.syntheticImages(docs)
        timed("1 gen images (noop)") {
          imgs.write.format("noop").mode("overwrite").save()
        }
        timed("2 gen+fingerprints (noop)") {
          Multimodal.imageFingerprints(imgs)
            .write.format("noop").mode("overwrite").save()
        }
        timed("3 gen+fps+save") {
          cat.save(Multimodal.imageFingerprints(imgs), "media.q84p_fps")
        }
        val fps = cat.load("media.q84p_fps")
        timed("4 imageAssign (noop)") {
          Multimodal.imageAssign(fps, maxHamming = 3)
            .write.format("noop").mode("overwrite").save()
        }
        timed("5 assign+save") {
          cat.save(Multimodal.imageAssign(fps, maxHamming = 3),
            "media.q84p_assign")
        }
        timed("6 final soundness join (noop)") {
          cat.load("media.q84p_assign")
            .filter(col("dup_of").isNotNull)
            .join(fps.select(col("media_id"), col("dhash").as("dh_m")), "media_id")
            .join(fps.select(col("media_id").as("dup_of"),
              col("dhash").as("dh_r")), "dup_of")
            .select(col("media_id"), col("dup_of"),
              graft.ext.Dedup.hamming(col("dh_m"), col("dh_r")).cast("long")
                .as("hamming"))
            .withColumn("sound",
              col("hamming") <= 3 && col("dup_of") < col("media_id"))
            .orderBy("media_id")
            .write.format("noop").mode("overwrite").save()
        }

      case "spectral" => // q86 shape
        val imgs = Multimodal.syntheticImages(docs)
        timed("1 gen+spectralFeatures (noop)") {
          Multimodal.imageSpectralFeatures(imgs)
            .write.format("noop").mode("overwrite").save()
        }
        timed("2 gen+feats+save") {
          cat.save(Multimodal.imageSpectralFeatures(imgs), "media.q86p_feats")
        }
        val feats = cat.load("media.q86p_feats")
        timed("3 imageFeatureAssign (noop)") {
          Multimodal.imageFeatureAssign(feats, threshold = 0.9)
            .write.format("noop").mode("overwrite").save()
        }
        timed("4 assign+save") {
          cat.save(Multimodal.imageFeatureAssign(feats, threshold = 0.9),
            "media.q86p_assign")
        }

      case "audio" => // q89 shape
        val audio = Multimodal.syntheticAudio(docs)
        timed("1 gen audio (noop)") {
          audio.write.format("noop").mode("overwrite").save()
        }
        timed("2 gen+spectralFeatures (noop)") {
          Multimodal.audioSpectralFeatures(audio)
            .write.format("noop").mode("overwrite").save()
        }
        timed("3 gen+feats+save") {
          cat.save(Multimodal.audioSpectralFeatures(audio), "media.q89p_feats")
        }
        val feats = cat.load("media.q89p_feats")
        timed("4 audioFeatureAssign (noop)") {
          Multimodal.audioFeatureAssign(feats, threshold = 0.9)
            .write.format("noop").mode("overwrite").save()
        }
        timed("5 assign+save") {
          cat.save(Multimodal.audioFeatureAssign(feats, threshold = 0.9),
            "media.q89p_assign")
        }
        timed("6 final soundness join (noop)") {
          cat.load("media.q89p_assign")
            .filter(col("dup_of").isNotNull)
            .join(feats.select(col("media_id"), col("feature").as("f_m")),
              "media_id")
            .join(feats.select(col("media_id").as("dup_of"),
              col("feature").as("f_r")), "dup_of")
            .select(col("media_id"), col("dup_of"),
              round(Similarity.cosine(col("f_m"), col("f_r")), 6)
                .as("cosine_sim"))
            .withColumn("sound",
              col("cosine_sim") > 0.9 && col("dup_of") < col("media_id"))
            .orderBy("media_id")
            .write.format("noop").mode("overwrite").save()
        }

      case "twin" => // q81 shape: nearDupAssign over the derived twin corpus
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val twin = emb.select(col("vec_id"), col("embedding").cast("array<double>")
            .as("embedding"))
          .union(emb.select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding").cast("array<double>"),
              x => x + lit(0.05)).as("embedding")))
        timed("1 twin corpus (noop)") {
          twin.write.format("noop").mode("overwrite").save()
        }
        timed("2 nearDupAssign (noop)") {
          Similarity.nearDupAssign(twin, threshold = 0.9,
            targetRecall = 0.9999)
            .write.format("noop").mode("overwrite").save()
        }
        timed("3 assign+save") {
          cat.save(Similarity.nearDupAssign(twin, threshold = 0.9,
            targetRecall = 0.9999), "ann.q81p_assign")
        }

      case other => sys.error(s"unknown family '$other'")
    }
    spark.stop()
  }
}
