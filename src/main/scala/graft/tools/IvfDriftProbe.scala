package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Ivf

/** Measured IVF recall under APPEND CHURN — the r16 scale lever: a trained
  * coarse quantizer is a train-once artifact, but a 100 TB corpus appends
  * daily through [[graft.ext.Ivf.appendAssign]] (assign to the persisted
  * centroids, no retrain). Nothing in the r15 engine measured what that
  * costs in recall or when a rebuild pays — this probe does, and its curve
  * is what `Ivf.MeasuredRebuildFraction` (the [[graft.ext.Ivf.IvfLedger]]
  * default) encodes.
  *
  * Corpus model: base vectors draw from `cells` hash-derived cluster
  * centers plus noise; appended batches draw EITHER from the same centers
  * (`iid` — the control: the trained quantizer has seen every regime) OR
  * from a disjoint center set (`drift` — the worst case: every appended
  * vector is a regime the quantizer never trained on). Real churn sits
  * between the two curves.
  *
  * Per appended fraction f, the probe reports recall@k (vs exact brute
  * force over the union, [[graft.ext.Ivf.measureRecall]]) three ways:
  * appended-only queries on the STALE quantizer (the drift casualty),
  * all-corpus queries on the stale quantizer (the blended number a
  * dashboard sees), and appended-only queries on a RETRAINED quantizer
  * (what a rebuild buys back). The rebuild threshold is where stale
  * appended-query recall falls materially below the retrained column.
  *
  * `sbt 'runMain graft.tools.IvfDriftProbe [--base N] [--fractions
  * 0.25,0.5,1,2] [--cells K] [--nProbe P] [--queries M] [--dim D]'`
  */
object IvfDriftProbe {

  /** Deterministic clustered vectors: ids [lo, hi) draw a center from
    * [centerBase, centerBase + cells) by id hash, then add per-id noise —
    * pure row functions, byte-identical on any partitioning. */
  private def clustered(spark: SparkSession, lo: Long, hi: Long, dim: Int,
      cells: Int, centerBase: Int, noise: Double): DataFrame = {
    val id = col("id")
    def h(src: org.apache.spark.sql.Column, d: Int, salt: Int) =
      (pmod(hash(src, lit(d), lit(salt)), lit(2001)) - lit(1000))
        .cast("double") / 1000.0
    val center = (pmod(hash(id, lit(99)), lit(cells)) + lit(centerBase)).cast("int")
    spark.range(lo, hi).select(id.as("vec_id"),
      array((0 until dim).map(d =>
        (h(center, d, 17) + h(id, d, 18) * noise).cast("float")): _*)
        .as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    var base = 200000L
    var fractions = Seq(0.25, 0.5, 1.0, 2.0)
    var cells = 64
    var nProbe = 3
    var queries = 32
    var dim = 32
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--base" if i + 1 < args.length => base = args(i + 1).toLong; i += 2
        case "--fractions" if i + 1 < args.length =>
          fractions = args(i + 1).split(",").map(_.toDouble).toSeq; i += 2
        case "--cells" if i + 1 < args.length => cells = args(i + 1).toInt; i += 2
        case "--nProbe" if i + 1 < args.length => nProbe = args(i + 1).toInt; i += 2
        case "--queries" if i + 1 < args.length => queries = args(i + 1).toInt; i += 2
        case "--dim" if i + 1 < args.length => dim = args(i + 1).toInt; i += 2
        case other => sys.error(s"unknown arg '$other'; usage: IvfDriftProbe " +
          "[--base N] [--fractions 0.25,..] [--cells K] [--nProbe P] " +
          "[--queries M] [--dim D]")
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.core.Sessions.local(cpus)
    val baseDf = clustered(spark, 0L, base, dim, cells, 0, 0.25)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // train on a bounded deterministic subsample — the ServeScaleProbe rule
    val step = math.max(1L, base / 100000L)
    val trained = Ivf.trainCentroids(
      baseDf.filter(pmod(col("vec_id"), lit(step)) === 0), k = cells, iters = 3)
    fractions.foreach { f =>
      val m = math.max(1L, (base * f).toLong)
      Seq(("iid", 0), ("drift", cells)).foreach { case (mode, centerBase) =>
        val appended = clustered(spark, base, base + m, dim, cells, centerBase, 0.25)
        val union = baseDf.unionAll(appended)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val t0 = System.nanoTime()
        val staleAppended = Ivf.measureRecall(union, trained, k = 10,
          nProbe = nProbe, nQueries = queries,
          queryFilter = col("vec_id") >= base)
        val staleAll = Ivf.measureRecall(union, trained, k = 10,
          nProbe = nProbe, nQueries = queries)
        val retrained = Ivf.trainCentroids(
          union.filter(pmod(col("vec_id"), lit(step)) === 0), k = cells, iters = 3)
        val retrainAppended = Ivf.measureRecall(union, retrained, k = 10,
          nProbe = nProbe, nQueries = queries,
          queryFilter = col("vec_id") >= base)
        val dt = (System.nanoTime() - t0) / 1e9
        union.unpersist()
        spark.sharedState.cacheManager.clearCache()
        println(f"""{"check":"ivf_append_drift","base":$base,"appended":$m,""" +
          f""""fraction":$f,"mode":"$mode","cells":$cells,"n_probe":$nProbe,""" +
          f""""recall_stale_appended":$staleAppended%.4f,""" +
          f""""recall_stale_all":$staleAll%.4f,""" +
          f""""recall_retrain_appended":$retrainAppended%.4f,""" +
          f""""queries":$queries,"wall_s":$dt%.3f}""")
      }
    }
    baseDf.unpersist()
    spark.stop()
  }
}
