package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Catalog
import graft.ext.{Ivf, Pq}

/** Cold-vs-warm ANN serving at artifact sizes that OUTGROW the sf0.1
  * corpus ([[ServeProbe]] measured cold/warm 0.9-1.1× there and correctly
  * diagnosed why: MB-scale artifacts live in the page cache). This probe
  * answers the capacity-planning question that measurement could not: at
  * what artifact size does the physical cold read start to matter, and
  * what does it scale WITH?
  *
  * It generates a deterministic synthetic corpus (hash-derived floats —
  * incompressible, so parquet bytes ≈ raw vector bytes; NOT the driver's
  * testdata, which is out of bounds to scale), persists the two
  * structurally different serving artifacts through the production code
  * paths (q68's cluster-partitioned IVF corpus and q69's PQ-encoded
  * corpus), and times the production search calls warm (page cache
  * populated) and cold (`drop_caches` before every rep, same JVM — so the
  * delta isolates the physical read, not process startup).
  *
  * The expected scale structure, which the numbers in SCALE.md confirm:
  * IVF cold reads only the nProbe probed partitions' bytes (partition
  * pruning), so its cold penalty scales with nProbe/cells × corpus, not
  * artifact size; PQ cold reads the full codes column but PRUNES the
  * embedding column (codes are m bytes/row vs dim·4), so its penalty
  * scales with m·rows. Neither ever pays full-artifact-size cold cost —
  * that is the design property, and the probe exists to show it holds in
  * measured numbers rather than by assertion.
  *
  * Not part of the driver contract; run via
  * `SPARK_GRAFT_FLUSH_CMD='sync; echo 3 > /proc/sys/vm/drop_caches' \
  *    sbt 'runMain graft.tools.ServeScaleProbe [--sizes N,N,..] [--reps N]'`.
  * Artifacts cache under /tmp/graft_ann_scale/n<rows> and are rebuilt only
  * when absent (the q75-q77 `_SUCCESS` servability contract). */
object ServeScaleProbe {

  /** /proc/diskstats whole-device filter: SCSI/IDE/Xen-virt/virtio/NVMe/
    * eMMC device names, matched generically across the family letter
    * (sda AND sdb/xvdf — an earlier `[a-z]+da?` form only matched the
    * FIRST SCSI device, silently reading ~0 cold MB on hosts whose data
    * disk is sdb+). Full-string matching excludes partition rows: sda1,
    * nvme0n1p1 and mmcblk0p1 all carry a trailing suffix these patterns
    * reject, so partition traffic is never double-counted beside its
    * parent device. Pinned in CoreSpec. */
  private[graft] val WholeDevicePattern =
    "(x?v|s|h)d[a-z]+|nvme\\d+n\\d+|mmcblk\\d+"

  def main(args: Array[String]): Unit = {
    var sizes = Seq(250000L, 1000000L, 4000000L)
    var reps = 2
    var flushCmd: Option[String] = sys.env.get("SPARK_GRAFT_FLUSH_CMD")
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--sizes" if i + 1 < args.length =>
          sizes = args(i + 1).split(",").map(_.trim.toLong).toSeq; i += 2
        case "--reps" if i + 1 < args.length => reps = args(i + 1).toInt; i += 2
        case "--flush" if i + 1 < args.length => flushCmd = Some(args(i + 1)); i += 2
        case other => sys.error(
          s"unknown arg '$other'; usage: ServeScaleProbe [--sizes N,..] [--reps N] [--flush CMD]")
      }
    }
    val dim = 64
    val cells = 64   // nProbe 3 of 64 => ~4.7% of the corpus probed
    val nProbe = 3
    val root = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROOT", "/tmp/graft_ann_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.core.Sessions.local(cpus)

    // physical-read meter: system-wide sectors-read from /proc/diskstats
    // around the pass (quiet host — the probe is the only IO source). This
    // is the evidence that the cold cost tracks BYTES PROBED (pruned
    // partitions / pruned columns), not artifact size: warm passes read
    // ~0 MB from disk, cold passes read the probed subset, never the whole
    // artifact. (Task-level inputMetrics don't account local-FS parquet
    // bytes on this build, so the meter reads the kernel's own ledger.)
    def sectorsRead(): Long =
      scala.util.Try {
        scala.io.Source.fromFile("/proc/diskstats").getLines()
          .map(_.trim.split("\\s+"))
          .filter(f => f.length > 5 && f(2).matches(WholeDevicePattern))
          .map(_(5).toLong).sum
      }.getOrElse(0L)

    /** Returns (seconds, physical MB read during the pass). */
    def timed(df: => DataFrame): (Double, Double) = {
      val r0 = sectorsRead()
      val s0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - s0) / 1e9
      val mb = (sectorsRead() - r0) * 512 / 1e6
      spark.sharedState.cacheManager.clearCache()
      (dt, mb)
    }
    def flush(): Unit = flushCmd.foreach { cmd =>
      val rc = scala.sys.process.Process(Seq("sh", "-c", cmd)).!
      if (rc != 0) sys.error(s"flush command failed (rc $rc): $cmd")
    }
    def dirMb(path: String): Double = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else f.length()
      val f = new java.io.File(path)
      if (f.exists()) walk(f) / 1e6 else 0.0
    }

    /** Deterministic corpus: per-element hash-derived floats in [-1, 1] —
      * a pure row function of (vec_id, dim index), so every rebuild at the
      * same size produces byte-identical artifacts. Each element takes one
      * of 2001 distinct values, so parquet dictionary-compresses ~2.7×
      * versus raw float bytes; `artifact_mb` reports the measured on-disk
      * size, which is what a cold read pays. */
    def synthetic(n: Long): DataFrame =
      spark.range(n).select(col("id").as("vec_id"),
        array((0 until dim).map(d =>
          ((pmod(hash(col("id"), lit(d)), lit(2001)) - lit(1000))
            .cast("double") / 1000.0).cast("float")): _*).as("embedding"))

    sizes.foreach { n =>
      val cat = new Catalog(spark, s"$root/n$n")
      val needBuild = !graft.queries.ExtQ.servable(cat,
        "ann.scale_centroids", "ann.scale_ivf", "ann.scale_codebooks",
        "ann.scale_pq")
      if (needBuild) {
        System.err.println(s"[scale-probe] building artifacts for n=$n ...")
        val emb = synthetic(n)
        // train on a ≤100k deterministic subsample: the probe measures the
        // SERVING read path; training quality only needs plausible cells
        val step = math.max(1L, n / 100000L)
        val sample = emb.filter(pmod(col("vec_id"), lit(step)) === 0)
        val cents = Ivf.trainCentroids(sample, k = cells, iters = 3)
        Ivf.saveCentroids(cat, "ann.scale_centroids", cents)
        // one file per cluster directory: the partition-pruned cold read
        // should count probed bytes, not seek across task-fragmented files
        cat.save(Ivf.assign(emb, cents).repartition(col("cluster")),
          "ann.scale_ivf", partitionBy = Seq("cluster"))
        val cb = Pq.trainCodebooks(sample, m = 8, k = 64, iters = 3)
        Pq.saveCodebooks(cat, "ann.scale_codebooks", cb)
        // q69's shape: codes beside the raw embedding column, so the PQ
        // scan's column pruning (codes read, embeddings skipped) is part
        // of what the cold number measures
        cat.save(Pq.encode(emb, cb), "ann.scale_pq")
      }

      def serveIvf(): DataFrame =
        Ivf.ivfTopKPartitioned(cat.load("ann.scale_ivf"),
          Ivf.loadCentroids(cat, "ann.scale_centroids"),
          queryId = 1L, k = 10, nProbe = nProbe)
      def servePq(): DataFrame = {
        val enc = cat.load("ann.scale_pq")
        val qv = enc.filter(col("vec_id") === 1L).select(col("embedding"))
          .take(1)(0).getSeq[Float](0).map(_.toDouble).toArray
        Pq.pqTopKVec(enc.filter(col("vec_id") =!= 1L), qv,
          Pq.loadCodebooks(cat, "ann.scale_codebooks"), topK = 10)
      }

      Seq(("ivf", () => serveIvf(), s"$root/n$n/ann/scale_ivf"),
          ("pq", () => servePq(), s"$root/n$n/ann/scale_pq")).foreach {
        case (fam, serve, artDir) =>
          timed(serve()) // discarded: codegen/JIT + warms the page cache
          val warm = (1 to reps).map(_ => timed(serve()))
          val cold = flushCmd.toSeq.flatMap(_ =>
            (1 to reps).map { _ => flush(); timed(serve()) })
          def fmt(xs: Seq[(Double, Double)]) =
            xs.map(x => f"${x._1}%.3f").mkString("[", ",", "]")
          val coldPart =
            if (cold.isEmpty) ""
            else f""","cold_min":${cold.map(_._1).min}%.3f,"cold":${fmt(cold)},""" +
              f""""cold_disk_mb":${cold.map(_._2).max}%.1f"""
          println(f"""{"rows":$n,"family":"$fam","artifact_mb":${dirMb(artDir)}%.1f,""" +
            f""""warm_min":${warm.map(_._1).min}%.3f,"warm":${fmt(warm)},""" +
            f""""warm_disk_mb":${warm.map(_._2).max}%.1f$coldPart}""")
      }
    }
    spark.stop()
  }
}
