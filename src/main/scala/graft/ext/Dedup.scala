package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (BASELINE.json
  * extension surface): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (the 100 TB story):
  *  - Exact dedup is a hash groupBy on a digest — one shuffle keyed by md5,
  *    never by the full text (shuffle bytes ∝ 32-char digest, not documents).
  *  - MinHash+LSH: per-doc signatures are computed scan-side (no shuffle);
  *    the only shuffle keys on (band, bucket), whose cardinality ~ n_docs ×
  *    n_bands; candidate pairs then verify with exact Jaccard — a self-join
  *    restricted to same-bucket groups instead of the quadratic cross join.
  *  - SimHash: 64-bit signature scan-side; near-dup lookup via bucketing on
  *    the high bits + XOR bit_count verification.
  */
object Dedup {

  /** Exact-dup clusters keyed by content digest (md5 of raw text). */
  def exactClusters(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(md5(col(textCol).cast("binary")).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper_id"))
      .filter(col("n_docs") > 1)

  /** Keep one doc per exact-content group (the minimum id). */
  def dropExactDuplicates(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.dropDuplicates(textCol)

  /** Word n-gram shingles as a distinct array; empty when the doc is shorter
    * than n (guard keeps ANSI `sequence` happy). */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextStats.tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array_distinct(array(concat_ws(" ", toks))))
  }

  /** Per-(doc, seed) min-hashes via the explode/groupBy formulation.
    *
    * Why not nested higher-order functions (`transform(seeds,
    * array_min(transform(shingles, ...)))`): HOFs are interpreted, and after
    * projection collapse the shingle expression re-evaluates once per seed —
    * O(k) scans of every document. Here each shingle is string-hashed exactly
    * once (`base`), the k seeded variants are cheap long-hashes, and the
    * min reduces through a partial (map-side) aggregation — so the shuffle
    * carries at most docs × k tiny rows no matter how large the corpus.
    */
  def minhashes(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, k: Int = 32): DataFrame =
    docs
      .select(col(idCol), explode(shingles(col(textCol), shingleN)).as("sh"))
      .select(col(idCol), xxhash64(col("sh")).as("base"))
      .select(col(idCol), col("base"), explode(sequence(lit(0), lit(k - 1))).as("seed"))
      .groupBy(col(idCol), col("seed"))
      .agg(min(xxhash64(col("seed"), col("base"))).as("mh"))

  /** LSH banding over [[minhashes]] output: seed div (k/bands) → band; the
    * band's bucket id hashes the seed-ordered minhash slice. */
  def minhashBuckets(mh: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    val width = k / bands
    mh.withColumn("band", expr(s"seed div $width"))
      .groupBy(col(idCol), col("band"))
      .agg(xxhash64(sort_array(collect_list(struct(col("seed"), col("mh"))))).as("bucket"))
  }

  /** Docs → (id, band, bucket) LSH table. */
  def minhashTable(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, k: Int = 32, bands: Int = 8): DataFrame =
    minhashBuckets(minhashes(docs, textCol, idCol, shingleN, k), idCol, k, bands)

  /** Candidate pairs from LSH buckets, verified with exact Jaccard over the
    * shingle sets; only pairs ≥ threshold survive. The self-join is
    * restricted to same (band,bucket) groups — the LSH trick that replaces
    * the quadratic cross join at scale — and shingle arrays are only joined
    * back in for the (few) surviving candidates.
    */
  def nearDupPairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      shingleN: Int = 3, k: Int = 32, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val bk = minhashTable(docs, textCol, idCol, shingleN, k, bands)
    val a = bk.select(col("band"), col("bucket"), col(idCol).as("doc_a"))
    val b = bk.select(col("band"), col("bucket"), col(idCol).as("doc_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val sh = docs.select(col(idCol), shingles(col(textCol), shingleN).as("sh"))
    candidates
      .join(sh.select(col(idCol).as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col(idCol).as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over tokens: majority vote per bit of the token hashes.
    * Single-pass native expression ([[graft.functions.SimHash64]]) — the
    * composable 64-fold HOF form walked every token array 64 times through
    * interpreted lambda machinery (13s at sf0.1 vs <1s for this). */
  def simhash(text: Column): Column =
    graft.functions.SimHash64(TextStats.tokens(text))

  /** Hamming distance between two simhashes (bit_count of XOR). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket on the top 16 bits (scale path — only
    * same-bucket docs join), verify hamming ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      maxHamming: Int = 12): DataFrame = {
    val sh = docs.select(col(idCol), simhash(col(textCol)).as("sh"))
      .withColumn("bucket", shiftright(col("sh"), 48))
    val a = sh.select(col("bucket"), col(idCol).as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("bucket"), col(idCol).as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(hamming(col("sh_a"), col("sh_b")) <= maxHamming)
      .select(col("doc_a"), col("doc_b"),
        hamming(col("sh_a"), col("sh_b")).cast("int").as("hamming"))
  }
}
