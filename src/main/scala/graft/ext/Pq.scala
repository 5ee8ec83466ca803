package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Catalog
import graft.functions.{NearestCentroid, PqAdc}

/** Product quantization (PQ) — the memory-bound serving shape of ANN
  * (Jégou et al. 2011): each embedding splits into `m` subvectors, each
  * subvector quantizes to one of `k` learned codewords, and the corpus
  * stores `m` small codes instead of `dim` floats (64-dim float → 8 codes
  * is 32×). Search is asymmetric (ADC): the query stays full-precision,
  * one m·k lookup table is computed per query driver-side, and every
  * corpus row scores in `m` adds — the approximation that makes
  * billion-vector in-memory serving possible where full-precision vectors
  * (3 TB/10^9 at 768-dim) cannot fit.
  *
  * Composition: PQ is orthogonal to the coarse structures — encode a
  * [[Ivf]]-clustered corpus and probe nProbe cells with ADC scoring
  * (IVF-PQ, the standard pairing), or rerank ADC's top candidates with
  * exact [[Similarity]] dot products (`rerank` here).
  *
  * Determinism: codebooks train per-subvector through the same
  * [[Ivf.trainCentroids]] Lloyd loop (float subvectors ⇒ bit-reproducible
  * on any partitioning), codes are [[NearestCentroid]] argmins (ties to
  * the lowest index), and ADC accumulates in fixed subvector order — so
  * encode + search reproduce exactly across layouts, test-pinned.
  *
  * On UNIT vectors squared-L2 order equals cosine order
  * (`‖q−x‖² = 2−2·cos`), so ADC ascending approximates cosine top-k
  * descending — the recall test measures exactly that correspondence.
  */
object Pq {

  /** Trained PQ codebooks: `books(m)(k)(subDim)` plus the split geometry. */
  case class Codebooks(books: Array[Array[Array[Double]]], subDim: Int) {
    def m: Int = books.length
    def k: Int = books.head.length
  }

  /** Train per-subvector codebooks with the deterministic Lloyd loop.
    * `dim` must divide evenly into `m` subvectors; `k` codewords each.
    *
    * All `m` loops run FUSED: one corpus pass per iteration assigns every
    * subvector's cluster (an array of [[NearestCentroid]] argmins over
    * sliced views), one `(sub, cluster, dim)`-keyed aggregation computes
    * every codebook's means — `iters + 2` Spark jobs total instead of the
    * `m·(iters + 2)` a per-subvector delegation would launch. The math is
    * identical to m independent [[Ivf.trainCentroids]] runs (same hashed-id
    * seed rows sliced per subvector, same means, same dead-centroid
    * convention), with [[Ivf]]'s determinism story: float corpora
    * reproduce bit-for-bit on any partitioning. */
  def trainCodebooks(emb: DataFrame, m: Int, k: Int = 16, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): Codebooks = {
    require(m >= 1 && k >= 1 && iters >= 1)
    // loud on an empty corpus: head() on zero rows is an opaque
    // NoSuchElementException far from the bad argument (the Pq.encode /
    // PqAdc loud-contract applied to the training entry point)
    val dimRows = emb.select(size(col(vecCol))).take(1)
    require(dimRows.nonEmpty, "trainCodebooks: empty corpus — nothing to train on")
    val dim = dimRows(0).getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subvectors")
    val subDim = dim / m
    val proj = emb.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // seed: the k vectors with smallest hashed id (Ivf's convention),
      // sliced driver-side into every subvector's initial codebook
      val seeds = proj
        .select(col(vecCol), xxhash64(col(idCol)).as("h"))
        .orderBy("h").limit(k)
        .collect().map(Similarity.toVec(_, 0))
      var books: Array[Array[Array[Double]]] =
        Array.tabulate(m)(j => seeds.map(_.slice(j * subDim, (j + 1) * subDim)))
      var it = 0
      while (it < iters) {
        val assigns = array(books.indices.map(j =>
          NearestCentroid(slice(col(vecCol), j * subDim + 1, subDim), books(j))): _*)
        val sub = (col("pos") / subDim).cast("int")
        // the persist MATERIALIZES cl once per row: without a barrier
        // here, the generate loop below inlines the m-argmin array
        // expression and re-evaluates it per EXPLODED row — a dim×
        // blowup of the assignment cost (measured 25× at dim 64). A
        // cache (storage-local) beats a repartition barrier (iters ×
        // corpus bytes over the network) — training shuffle volume
        // stays m·k·subDim, the Ivf contract.
        val assigned = proj.select(col(vecCol), assigns.as("cl"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sums = try {
          assigned
            .select(col("cl"), posexplode(col(vecCol)))
            .select(sub.as("sub"), element_at(col("cl"), sub + 1).as("cluster"),
              pmod(col("pos"), lit(subDim)).as("d"), col("col"))
            .groupBy("sub", "cluster", "d").agg(avg("col").as("mavg"))
            .collect()
        } finally assigned.unpersist(blocking = false)
        val bySub = sums.groupBy(_.getInt(0))
        books = Array.tabulate(m) { j =>
          val byCluster = bySub.getOrElse(j, Array.empty).groupBy(_.getInt(1))
          books(j).zipWithIndex.map { case (prev, c) =>
            byCluster.get(c)
              .map(_.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray)
              .getOrElse(prev)
          }
        }
        it += 1
      }
      Codebooks(books, subDim)
    } finally proj.unpersist(blocking = false)
  }

  /** Corpus + `codes` column (`array<int>`, length m): each subvector's
    * nearest codeword. Scan-stage — m [[NearestCentroid]] argmins over
    * sliced views, no shuffle; write the result once and serve from it.
    * Rows whose vector dimension does not match the codebook geometry
    * fail loudly — a silently truncated slice would argmin over nothing
    * and emit code 0 (corrupt codes with no error). */
  def encode(emb: DataFrame, cb: Codebooks, vecCol: String = "embedding"): DataFrame = {
    val expectDim = cb.m * cb.subDim
    emb.withColumn("codes",
      // null must fail as loudly as a wrong dim: size(null) is null, so the
      // =!= guard alone would fall through and emit all-null codes, which
      // PqAdc's primitive getInt reads as codeword 0 — the row would score
      // with a FABRICATED distance and could silently enter a top-k
      when(col(vecCol).isNull,
        raise_error(lit(s"pq encode: null $vecCol (expected $expectDim floats)")))
        .when(size(col(vecCol)) =!= expectDim,
          raise_error(concat(lit(s"pq encode: vector dim "),
            size(col(vecCol)).cast("string"),
            lit(s" != codebook geometry $expectDim"))))
        .otherwise(array(cb.books.indices.map(j =>
          NearestCentroid(slice(col(vecCol), j * cb.subDim + 1, cb.subDim),
            cb.books(j))): _*)))
  }

  /** The per-query ADC lookup table: `table(j·k + c) = ‖q_j − books(j)(c)‖²`
    * flattened in subvector-major order (what [[PqAdc]] expects). */
  def adcTable(query: Array[Double], cb: Codebooks): Array[Double] = {
    require(query.length == cb.m * cb.subDim,
      s"query dim ${query.length} != ${cb.m}×${cb.subDim}")
    val tab = new Array[Double](cb.m * cb.k)
    for (j <- 0 until cb.m; c <- 0 until cb.k) {
      var s = 0.0
      var d = 0
      while (d < cb.subDim) {
        val diff = query(j * cb.subDim + d) - cb.books(j)(c)(d)
        s += diff * diff
        d += 1
      }
      tab(j * cb.k + c) = s
    }
    tab
  }

  /** Approximate top-k by ADC over an [[encode]]d corpus — vector-first
    * (the serving shape: external queries never scan the corpus for a
    * lookup). Plan: scan-stage [[PqAdc]] score + `TakeOrderedAndProject`;
    * ties break on id for determinism. Scores round to 6 decimals BEFORE
    * the cut — the [[Similarity]] rounded-cosine convention — so the
    * top-k boundary is a function of values any engine reproduces (what
    * lets a DuckDB oracle replay the search over persisted codes), not of
    * last-ulp summation order. */
  def pqTopKVec(encoded: DataFrame, query: Array[Double], cb: Codebooks,
      topK: Int, idCol: String = "vec_id"): DataFrame =
    encoded
      .withColumn("adc",
        round(PqAdc(col("codes"), adcTable(query, cb).toSeq, cb.k), 6))
      .orderBy(col("adc"), col(idCol))
      .limit(topK)
      .select(col(idCol), col("adc"))

  /** ADC shortlist → exact rerank: score `shortlist`× more candidates with
    * the table, then rerank those by exact dot product against the raw
    * vectors carried on the encoded corpus — the standard PQ accuracy
    * recovery, costing exact math on shortlist·topK rows instead of the
    * corpus. */
  def pqTopKRerankVec(encoded: DataFrame, query: Array[Double], cb: Codebooks,
      topK: Int, shortlist: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val qCol = typedLit(query.toSeq)
    pqTopKVec(encoded, query, cb, topK * shortlist, idCol)
      .join(encoded.select(col(idCol), col(vecCol)), Seq(idCol))
      .withColumn("score",
        round(graft.functions.VectorFunctions.dot(
          col(vecCol).cast("array<double>"), qCol), 6))
      .orderBy(desc("score"), col(idCol))
      .limit(topK)
      .select(col(idCol), col("score"))
  }

  /** IVF-PQ — the standard pairing: restrict ADC search to the `nProbe`
    * coarse cells nearest the query, then shortlist + exact rerank inside
    * them. `clusteredEncoded` carries both a `cluster` column
    * ([[Ivf.assign]]; write it as a partition column and the probe filter
    * prunes to nProbe directories, [[Ivf.ivfTopKPartitionedVec]]'s story)
    * and `codes` ([[encode]]) — at 100 TB the scan reads nProbe/k of the
    * corpus AND each row it reads is m bytes, the two reductions composed. */
  def ivfPqTopKVec(clusteredEncoded: DataFrame, centroids: Array[Array[Double]],
      cb: Codebooks, query: Array[Double], topK: Int, nProbe: Int = 2,
      shortlist: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    TableShapes.requireColumns(clusteredEncoded, Seq("cluster", "codes"),
      "ivfPqTopKVec", "'cluster' comes from Ivf.assign, 'codes' from Pq.encode")
    val probes = Ivf.nearestClusters(query, centroids, nProbe)
    pqTopKRerankVec(
      clusteredEncoded.filter(col("cluster").isin(probes: _*)),
      query, cb, topK, shortlist, idCol, vecCol)
  }

  /** Persist codebooks through the [[Catalog]] — (sub, code, centroid)
    * rows, m·k·subDim doubles; the train-once artifact (doubles round-trip
    * parquet exactly, like [[Ivf.saveCentroids]]). */
  def saveCodebooks(catalog: Catalog, ref: String, cb: Codebooks): Unit = {
    import catalog.spark.implicits._
    catalog.save(
      cb.books.zipWithIndex.flatMap { case (book, j) =>
        book.zipWithIndex.map { case (cent, c) => (j, c, cent.toSeq) }
      }.toSeq.toDF("sub", "code", "centroid"), ref)
  }

  def loadCodebooks(catalog: Catalog, ref: String): Codebooks = {
    val rows = catalog.load(ref).select(col("sub"), col("code"), col("centroid"))
      .collect().map(r => (r.getInt(0), r.getInt(1), Similarity.toVec(r, 2)))
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toArray).toArray
    require(books.nonEmpty && books.head.nonEmpty,
      s"loadCodebooks('$ref'): artifact table is empty — not a trained codebook")
    Codebooks(books, books.head.head.length)
  }
}
