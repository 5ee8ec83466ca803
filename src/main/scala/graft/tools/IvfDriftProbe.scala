package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Ivf, Pq}

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
  * `--family pq` runs the SAME protocol for the PQ tier
  * ([[graft.ext.Pq.appendEncode]]): what staleness costs there is not
  * placement but QUANTIZATION DISTORTION — appended vectors from an
  * unseen regime sit farther from every codeword, so their ADC orderings
  * blur ([[graft.ext.Pq.measureRecall]], pure ADC — rerank would mask
  * exactly the distortion being metered).
  *
  * `sbt 'runMain graft.tools.IvfDriftProbe [--base N] [--fractions
  * 0.25,0.5,1,2] [--cells K] [--nProbe P] [--queries M] [--dim D]
  * [--family ivf|pq] [--m M] [--codewords K]'`
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
    var family = "ivf"
    var m = 8
    var codewords = 16
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
        case "--family" if i + 1 < args.length => family = args(i + 1); i += 2
        case "--m" if i + 1 < args.length => m = args(i + 1).toInt; i += 2
        case "--codewords" if i + 1 < args.length =>
          codewords = args(i + 1).toInt; i += 2
        case other => sys.error(s"unknown arg '$other'; usage: IvfDriftProbe " +
          "[--base N] [--fractions 0.25,..] [--cells K] [--nProbe P] " +
          "[--queries M] [--dim D] [--family ivf|pq] [--m M] [--codewords K]")
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.core.Sessions.local(cpus)
    val baseDf = clustered(spark, 0L, base, dim, cells, 0, 0.25)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // train on a bounded deterministic subsample — the ServeScaleProbe rule
    val step = math.max(1L, base / 100000L)
    require(family == "ivf" || family == "pq",
      s"--family must be ivf|pq, got '$family'")
    // the stale artifact trains once on the base (the bounded
    // deterministic subsample rule), each cell retrains on the union
    val trainedCents =
      if (family == "ivf") Ivf.trainCentroids(
        baseDf.filter(pmod(col("vec_id"), lit(step)) === 0), k = cells, iters = 3)
      else null
    val trainedCb =
      if (family == "pq") Pq.trainCodebooks(
        baseDf.filter(pmod(col("vec_id"), lit(step)) === 0),
        m = m, k = codewords, iters = 3)
      else null
    fractions.foreach { f =>
      val app = math.max(1L, (base * f).toLong)
      Seq(("iid", 0), ("drift", cells)).foreach { case (mode, centerBase) =>
        val appended = clustered(spark, base, base + app, dim, cells, centerBase, 0.25)
        val union = baseDf.unionAll(appended)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val t0 = System.nanoTime()
        if (family == "ivf") {
          val staleAppended = Ivf.measureRecall(union, trainedCents, k = 10,
            nProbe = nProbe, nQueries = queries,
            queryFilter = col("vec_id") >= base)
          val staleAll = Ivf.measureRecall(union, trainedCents, k = 10,
            nProbe = nProbe, nQueries = queries)
          val retrained = Ivf.trainCentroids(
            union.filter(pmod(col("vec_id"), lit(step)) === 0), k = cells, iters = 3)
          val retrainAppended = Ivf.measureRecall(union, retrained, k = 10,
            nProbe = nProbe, nQueries = queries,
            queryFilter = col("vec_id") >= base)
          val dt = (System.nanoTime() - t0) / 1e9
          union.unpersist()
          spark.sharedState.cacheManager.clearCache()
          println(f"""{"check":"ivf_append_drift","base":$base,"appended":$app,""" +
            f""""fraction":$f,"mode":"$mode","cells":$cells,"n_probe":$nProbe,""" +
            f""""recall_stale_appended":$staleAppended%.4f,""" +
            f""""recall_stale_all":$staleAll%.4f,""" +
            f""""recall_retrain_appended":$retrainAppended%.4f,""" +
            f""""queries":$queries,"wall_s":$dt%.3f}""")
        } else {
          // PQ's drift signal is the SHORTLIST MULTIPLIER rerank needs to
          // reach target recall (Pq.measureShortlist — the production
          // sizing instrument): pure-ADC top-k recall on a near-tie
          // corpus reads ~0 for stale AND retrained codebooks alike
          // (quantization resolution, not drift — measured, SCALE.md
          // r16), so the meaningful question is how much WIDER the
          // serving shortlist must get before rerank recovers, stale vs
          // retrained, on the appended regime.
          val staleApp = Pq.measureShortlist(appended, trainedCb, k = 10,
            targetRecall = 0.9, nQueries = queries)
          val retrainedCb = Pq.trainCodebooks(
            union.filter(pmod(col("vec_id"), lit(step)) === 0),
            m = m, k = codewords, iters = 3)
          val retrainApp = Pq.measureShortlist(appended, retrainedCb, k = 10,
            targetRecall = 0.9, nQueries = queries)
          val staleBase = Pq.measureShortlist(baseDf, trainedCb, k = 10,
            targetRecall = 0.9, nQueries = queries)
          val dt = (System.nanoTime() - t0) / 1e9
          union.unpersist()
          spark.sharedState.cacheManager.clearCache()
          // fixed-rung recalls expose sub-rung drift the chosen
          // multiplier's 2x ladder quantizes away
          def rung(mm: graft.ext.Pq.ShortlistMeasurement, r: Int): Double =
            mm.ladder.find(_._1 == r).map(_._2).getOrElse(-1.0)
          println(f"""{"check":"pq_append_drift","base":$base,"appended":$app,""" +
            f""""fraction":$f,"mode":"$mode","m":$m,"codewords":$codewords,""" +
            f""""shortlist_stale_appended":${staleApp.shortlist},""" +
            f""""recall_stale_appended":${staleApp.measuredRecall}%.4f,""" +
            f""""stale_r4":${rung(staleApp, 4)}%.4f,"stale_r8":${rung(staleApp, 8)}%.4f,""" +
            f""""shortlist_retrain_appended":${retrainApp.shortlist},""" +
            f""""recall_retrain_appended":${retrainApp.measuredRecall}%.4f,""" +
            f""""retrain_r4":${rung(retrainApp, 4)}%.4f,"retrain_r8":${rung(retrainApp, 8)}%.4f,""" +
            f""""shortlist_stale_base":${staleBase.shortlist},""" +
            f""""base_r8":${rung(staleBase, 8)}%.4f,""" +
            f""""queries":$queries,"wall_s":$dt%.3f}""")
        }
      }
    }
    baseDf.unpersist()
    spark.stop()
  }
}
