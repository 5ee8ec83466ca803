package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{Ivf, Pq}

/** Stage-timing probe for the IVF/PQ after-append witnesses (q87/q90/q92)
  * — r19 optimization round. Times train / save / encode / append / search
  * separately so optimization targets the measured stage. */
object AnnProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local(cpus)

    def timed[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[annprofile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val cat = new graft.core.Catalog(spark,
      s"/tmp/graft_ann/${new java.io.File(sfDir).getName}")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"[annprofile] emb rows=${emb.count()} scanParts=${emb.rdd.getNumPartitions} dim=${emb.select(size(col("embedding"))).head.getInt(0)}")
    val evens = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val odds = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val cents = timed("1. Ivf.trainCentroids k=8 iters=3") {
      Ivf.trainCentroids(evens, k = 8, iters = 3)
    }
    val cb = timed("2. Pq.trainCodebooks m=8 k=64 iters=3") {
      Pq.trainCodebooks(evens, m = 8, k = 64, iters = 3)
    }
    timed("3. save centroids+codebooks") {
      Ivf.saveCentroids(cat, "ann.q92p_centroids", cents)
      Pq.saveCodebooks(cat, "ann.q92p_codebooks", cb)
    }
    timed("4. encode+save evens (partitioned)") {
      cat.save(Pq.encode(Ivf.assign(evens, cents), cb), "ann.q92p_corpus",
        partitionBy = Seq("cluster"))
    }
    timed("5. appendAssignEncode odds") {
      Pq.appendAssignEncode(cat, "ann.q92p_corpus", "ann.q92p_centroids",
        "ann.q92p_codebooks", odds)
    }
    val corpus = timed("6. load corpus")(cat.load("ann.q92p_corpus"))
    val qv = timed("7. take query vector") {
      corpus.filter(col("vec_id") === 0L).select(col("embedding")).take(1)(0)
        .getSeq[Float](0).map(_.toDouble).toArray
    }
    timed("8. ivfPqTopKVec search (noop)") {
      Pq.ivfPqTopKVec(corpus.filter(col("vec_id") =!= 0L),
        Ivf.loadCentroids(cat, "ann.q92p_centroids"),
        Pq.loadCodebooks(cat, "ann.q92p_codebooks"),
        qv, topK = 10, nProbe = 3, shortlist = 10)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
