package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.NearestCentroid

/** IVF (inverted-file) approximate nearest neighbour — the k-means-coarse-
  * quantizer alternative to the hyperplane-LSH path in [[Similarity]].
  *
  * IVF beats LSH when the corpus is CLUSTERED (real embedding corpora are):
  * the coarse quantizer adapts its cells to the data distribution, while
  * hyperplane buckets are data-oblivious. Cost: a training pass; LSH needs
  * none.
  *
  * Determinism: seeding by `xxhash64(id)` order and argmin ties to the
  * lowest centroid index ([[NearestCentroid]]) are exact; the per-cluster
  * means are Spark double `avg`s, whose partial sums are EXACT for
  * `array<float>` corpora (24-bit mantissas summed in 53-bit doubles, n
  * far below 2^29 per cluster) — so float-embedding train + probe
  * reproduce bit-for-bit on any partitioning (repartition-invariance is
  * test-pinned). For `array<double>` corpora the merge order of partial
  * sums can differ in the last ulp across partitionings; assignments are
  * then deterministic only up to boundary vectors within an ulp of two
  * centroids.
  *
  * Scale design: training touches the corpus `iters` times but each pass is
  * one scan + one (cluster, dim)-keyed aggregation — shuffle rows = k·dim,
  * not corpus size. The centroid matrix (k·dim doubles) rides inside the
  * [[NearestCentroid]] expression, so assignment is scan-stage work with no
  * join; at 100 TB, write `cluster` as a partition column once
  * (`partitionBy("cluster")`) and every probe prunes to nProbe/k of the
  * files — the classic IVF file-pruning story, expressed as Spark
  * partition pruning.
  */
object Ivf {

  private def toVec(row: org.apache.spark.sql.Row, i: Int): Array[Double] =
    row.getSeq[Any](i).map {
      case f: Float => f.toDouble
      case d: Double => d
      case n: Number => n.doubleValue()
    }.toArray

  /** Deterministic Lloyd k-means over an `array<float|double>` column.
    * Returns the k centroids (empty clusters keep their previous centroid,
    * mirroring the standard "dead centroid" convention). */
  def trainCentroids(emb: DataFrame, k: Int, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    require(k >= 1 && iters >= 1)
    // training issues iters+1 actions over the same projection — persist
    // for its duration (and release after: the function is fully
    // materialized, so the cache has no live consumers once it returns)
    val proj = emb.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // seed: the k vectors with smallest hashed id — a deterministic
      // pseudo-random sample, independent of row order and partitioning
      var cents: Array[Array[Double]] = proj
        .select(col(vecCol), xxhash64(col(idCol)).as("h"))
        .orderBy("h").limit(k)
        .collect().map(toVec(_, 0))
      var it = 0
      while (it < iters) {
        // elementwise means per cluster: explode to (cluster, dim, value),
        // aggregate — k·dim result rows regardless of corpus size
        val sums = proj
          .select(NearestCentroid(col(vecCol), cents).as("cluster"),
            posexplode(col(vecCol)))
          .groupBy(col("cluster"), col("pos"))
          .agg(avg(col("col")).as("m"))
          .collect()
        val byCluster = sums.groupBy(_.getInt(0))
        cents = cents.zipWithIndex.map { case (prev, c) =>
          byCluster.get(c)
            .map(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
            .getOrElse(prev)
        }
        it += 1
      }
      cents
    } finally proj.unpersist(blocking = false)
  }

  /** Cluster assignment column for writing/bucketing the corpus. */
  def assign(emb: DataFrame, centroids: Array[Array[Double]],
      vecCol: String = "embedding"): DataFrame =
    emb.withColumn("cluster", NearestCentroid(col(vecCol), centroids))

  private def l2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val m = math.min(a.length, b.length)
    while (i < m) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** The `nProbe` cluster indices nearest `qv` (L2 to centroid, index
    * tie-break via the tuple sort). */
  private def nearestClusters(qv: Array[Double], centroids: Array[Array[Double]],
      nProbe: Int): Seq[Int] =
    centroids.zipWithIndex.map { case (c, i) => (l2(qv, c), i) }
      .sorted.take(nProbe).map(_._2).toSeq

  /** Exact-cosine rerank of `cells` against `queryId`'s vector, top-k.
    * The query's squared norm rides the 1-row broadcast so each probed row
    * costs two dots, not three (values bit-identical). */
  private def rerank(cells: DataFrame, source: DataFrame, queryId: Long, k: Int,
      idCol: String, vecCol: String): DataFrame =
    cells
      .crossJoin(broadcast(
        source.filter(col(idCol) === queryId)
          .select(col(vecCol).as("qv"), Similarity.norm2(col(vecCol)).as("n2q"))))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        round(Similarity.cosinePre(col(vecCol), col("qv"), col("n2q")), 6)
          .as("cosine_sim"))
      .orderBy(desc("cosine_sim"), col(idCol))
      .limit(k)

  /** Empty (idCol, cosine_sim) result — the degraded shape every sibling
    * top-k returns when the queryId is absent. */
  private def emptyTopK(emb: DataFrame, idCol: String): DataFrame =
    emb.select(col(idCol), lit(0.0d).as("cosine_sim")).limit(0)

  /** IVF top-k: probe only the `nProbe` cells nearest the query vector,
    * exact-rerank by cosine inside them. Same output shape/ordering as
    * [[Similarity.bruteForceTopK]]; recall vs that baseline is measured in
    * ExtSpec. A missing `queryId` degrades to an empty result, like every
    * sibling top-k. */
  def ivfTopK(emb: DataFrame, centroids: Array[Array[Double]], queryId: Long,
      k: Int, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qRows = emb.filter(col(idCol) === queryId).select(col(vecCol)).take(1)
    if (qRows.isEmpty) return emptyTopK(emb, idCol)
    val probes = nearestClusters(toVec(qRows(0), 0), centroids, nProbe)
    rerank(
      assign(emb, centroids, vecCol).filter(col("cluster").isin(probes: _*)),
      emb, queryId, k, idCol, vecCol)
  }

  /** IVF top-k over a CLUSTER-PARTITIONED corpus — the 100 TB probe path.
    *
    * `clustered` must carry a stored `cluster` column, i.e. the corpus was
    * written once via `Catalog.save(Ivf.assign(emb, cents), ref,
    * partitionBy = Seq("cluster"))` and re-loaded. The probe filter then
    * hits the PARTITION column, so the parquet scan prunes to the nProbe
    * cell directories (`PartitionFilters` in the plan; pruning is
    * plan-asserted in ExtSpec) instead of scanning the corpus and
    * recomputing assignments — the classic IVF inverted-file lookup,
    * expressed as Spark partition pruning. Results are identical to
    * [[ivfTopK]] on the same corpus + centroids (also test-asserted). */
  def ivfTopKPartitioned(clustered: DataFrame, centroids: Array[Array[Double]],
      queryId: Long, k: Int, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(clustered.columns.contains("cluster"),
      "ivfTopKPartitioned requires a stored 'cluster' column — write the " +
        "corpus once via Catalog.save(Ivf.assign(emb, centroids), ref, " +
        "partitionBy = Seq(\"cluster\")) and pass the re-loaded table " +
        "(use ivfTopK for an unpartitioned corpus)")
    val qRows = clustered.filter(col(idCol) === queryId).select(col(vecCol)).take(1)
    if (qRows.isEmpty) return emptyTopK(clustered, idCol)
    val probes = nearestClusters(toVec(qRows(0), 0), centroids, nProbe)
    rerank(
      clustered.filter(col("cluster").isin(probes: _*)),
      clustered, queryId, k, idCol, vecCol)
  }
}
