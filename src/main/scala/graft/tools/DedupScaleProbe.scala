package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}

/** Measured sublinearity evidence for the dedup families, at corpus sizes
  * that outgrow sf0.1 (the [[ServeScaleProbe]] treatment applied to dedup —
  * the r10 review's remaining "asserted, not measured" scale property).
  *
  * The candidate-volume curve tests in ExtSpec prove the collision
  * relations are bucketed-not-all-pairs at sf0.1 (~500 docs); this probe
  * runs the SAME production entry points for all three families
  * ([[Dedup.minhashTable]] → [[Dedup.bandCandidates]],
  * [[Dedup.simhashBlockTable]] → [[Dedup.simhashPairsFromBlocks]],
  * [[Similarity.lshTable]] → [[Similarity.lshCandidatesFromTable]] with
  * production [[Similarity.lshParams]] auto-sizing) on deterministic
  * synthetic corpora of 250k/1M/4M documents and records, per size: table
  * build time, candidate derivation time, and candidate-pair volume. The
  * claim under test — the one that decides whether the design survives
  * 100 TB — is that BOTH time and volume grow ~linearly in corpus size
  * (all-pairs would grow the pair count quadratically: 4M docs =>
  * 8×10^12 raw pairs, vs the ~linear dup-rate × n this probe expects).
  *
  * Corpus: a pure row function of doc id (hash-derived words; rebuilds are
  * byte-identical — the [[ServeScaleProbe]] determinism contract). Every
  * 20th document is a mutated copy of its predecessor (~5% of positions
  * re-rolled), so the TRUE near-dup pair count is n/20 by construction at
  * every size — a known-linear ground truth the measured candidate volume
  * can be read against: candidates ≈ n/20 + band-collision leakage, and
  * leakage growing faster than n would indict the banding, not the host.
  *
  * Pairing is timed from the PERSISTED table (written to parquet first),
  * mirroring the q71/q72 write-once/pair-many serving form and keeping the
  * derivation number independent of generation cost.
  *
  * Not part of the driver contract; run via
  * `sbt 'runMain graft.tools.DedupScaleProbe [--sizes N,N,..] [--reps N]'`.
  * Tables cache under /tmp/graft_dedup_scale/n<rows> and are rebuilt only
  * when absent. */
object DedupScaleProbe {

  def main(args: Array[String]): Unit = {
    var sizes = Seq(250000L, 1000000L, 4000000L)
    var reps = 2
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--sizes" if i + 1 < args.length =>
          sizes = args(i + 1).split(",").map(_.trim.toLong).toSeq; i += 2
        case "--reps" if i + 1 < args.length => reps = args(i + 1).toInt; i += 2
        case other => sys.error(
          s"unknown arg '$other'; usage: DedupScaleProbe [--sizes N,..] [--reps N]")
      }
    }
    // fail at parse time, not with a NoSuchElementException after an
    // hour of table building
    require(reps >= 1, s"--reps must be >= 1, got $reps")
    require(sizes.nonEmpty && sizes.forall(_ > 0), s"bad --sizes: $sizes")
    val root = sys.env.getOrElse("SPARK_GRAFT_DEDUP_ROOT", "/tmp/graft_dedup_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.core.Sessions.local(cpus)

    def timed[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = body
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      (dt, a)
    }

    /** Deterministic corpus: doc i is `words` vocabulary draws, each a pure
      * hash of (source id, position). Docs with id % 20 == 1 re-draw from
      * their OWN id at ~5% of positions and from the predecessor elsewhere
      * — a near-dup at Jaccard ~0.9 (shingle-level) of id-1, so true
      * near-dup pairs = n/20 exactly, at every size. Vocabulary 50k keeps
      * random cross-doc shingle overlap negligible: candidate leakage
      * measures BAND collisions, not accidental real similarity. */
    def synthetic(n: Long, words: Int = 60, vocab: Int = 50000): DataFrame = {
      val id = col("id")
      val isDup = pmod(id, lit(20)) === 1
      val base = when(isDup, id - 1).otherwise(id)
      val text = array_join(
        transform(sequence(lit(0), lit(words - 1)), p =>
          concat(lit("w"), pmod(hash(
            when(isDup && pmod(hash(id, p, lit(777)), lit(20)) === 0, id)
              .otherwise(base), p), lit(vocab)))),
        " ")
      spark.range(n).select(id.as("doc_id"), text.as("text"))
    }

    /** Deterministic embedding corpus, same dup structure: docs with
      * id % 20 == 1 carry the predecessor's vector plus a 5%-amplitude
      * hash-derived perturbation — cosine ≈ 0.999 to the original, far
      * above the 0.98 probe threshold, while unrelated hash-vectors sit
      * near 0. True near-dup pairs = n/20, as in the text corpus. */
    def syntheticVec(n: Long, dim: Int = 64): DataFrame = {
      val id = col("id")
      val isDup = pmod(id, lit(20)) === 1
      val base = when(isDup, id - 1).otherwise(id)
      def h(src: org.apache.spark.sql.Column, d: Int, salt: Int) =
        (pmod(hash(src, lit(d), lit(salt)), lit(2001)) - lit(1000))
          .cast("double") / 1000.0
      spark.range(n).select(id.as("vec_id"),
        array((0 until dim).map(d =>
          (h(base, d, 0) + when(isDup, h(id, d, 1) * 0.05).otherwise(lit(0.0)))
            .cast("float")): _*).as("embedding"))
    }

    /** Returns true when it actually built — a cached re-run's ~0s
      * "build time" must not be emitted as a measurement. */
    def ensure(path: String)(build: => DataFrame): Boolean =
      if (new java.io.File(s"$path/_SUCCESS").exists()) false
      else {
        System.err.println(s"[dedup-probe] building $path ...")
        build.write.mode("overwrite").parquet(path)
        true
      }

    sizes.foreach { n =>
      val dir = s"$root/n$n"
      // ---- build once per size, through the production scan-side paths;
      // the JSON fragment reports the measured seconds only for a REAL
      // build (a cached re-run says so instead of passing a File.exists
      // check off as scan-side work)
      def buildJson(t: (Double, Boolean)): String =
        if (t._2) f""""build_s":${t._1}%.3f""" else """"build_cached":true"""
      val bandBuild = timed {
        ensure(s"$dir/bands") {
          Dedup.minhashTable(synthetic(n), "text", "doc_id", shingleN = 3,
            k = 32, bands = 8)
        }
      }
      val blockBuild = timed {
        ensure(s"$dir/blocks") {
          Dedup.simhashBlockTable(
            synthetic(n).select(col("doc_id"),
              Dedup.simhash(col("text")).as("simhash")),
            "doc_id", "simhash", maxHamming = 3)
        }
      }
      // embedding-LSH family: production auto-sizing picks (planes,
      // tables) per corpus size — depth growing with n is exactly what
      // keeps candidate volume linear, so the probe exercises the sizing,
      // not a pinned config
      val (planes, tables) = Similarity.lshParams(n, threshold = 0.98)
      val lshBuild = timed {
        ensure(s"$dir/lshbuckets") {
          Similarity.lshTable(syntheticVec(n), planes, tables)
        }
      }
      // ---- pairing, timed from the persisted table (min-of-reps wall
      // time; volume is identical every rep — it's a deterministic count).
      // `detected` re-derives once, untimed, to count surviving PLANTED
      // pairs (id_b = id_a + 1 with id_b in the dup residue class) — for
      // the text families candidates ≈ detected by construction, but the
      // embedding family's fixed-depth buckets admit random collisions,
      // and leakage = pairs − detected is the quantity that must not
      // outgrow n.
      def run(fam: String, build: String, meta: String,
          derive: () => DataFrame, aCol: String, bCol: String): Unit = {
        val rs = (1 to reps).map(_ => timed(derive().count()))
        val pairs = rs.head._2
        require(rs.forall(_._2 == pairs),
          s"$fam candidate count varied across reps: ${rs.map(_._2)}")
        val detected = derive()
          .filter(col(bCol) === col(aCol) + 1 && pmod(col(bCol), lit(20)) === 1)
          .count()
        spark.sharedState.cacheManager.clearCache()
        val secs = rs.map(_._1)
        println(f"""{"rows":$n,"family":"$fam",$build,""" +
          f""""pairs_s":${secs.min}%.3f,"pairs_runs":${secs.map(s => f"$s%.3f")
            .mkString("[", ",", "]")},"pairs":$pairs,"detected":$detected,""" +
          f""""true_dups":${n / 20}$meta}""")
      }
      run("minhash_lsh", buildJson(bandBuild), "", () =>
        Dedup.bandCandidates(spark.read.parquet(s"$dir/bands"), "doc_id"),
        "doc_a", "doc_b")
      run("simhash", buildJson(blockBuild), "", () =>
        Dedup.simhashPairsFromBlocks(spark.read.parquet(s"$dir/blocks"), "doc_id"),
        "doc_a", "doc_b")
      run("embedding_lsh", buildJson(lshBuild),
        s""","planes":$planes,"tables":$tables""",
        () => Similarity.lshCandidatesFromTable(
          spark.read.parquet(s"$dir/lshbuckets"), "vec_id"),
        "id_a", "id_b")
    }
    spark.stop()
  }
}
