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

  /** Per-doc minhash signature as k wide columns (`mh_0..mh_{k-1}`) in ONE
    * grouped aggregate.
    *
    * Why this shape: nested higher-order functions (`transform(seeds,
    * array_min(transform(shingles, ...)))`) are interpreted and re-evaluate
    * the shingle expression per seed; an explicit seed-explode creates a
    * docs × shingles × k row blow-up before the groupBy. Here shingle rows
    * explode once (docs × shingles), each shingle is string-hashed once
    * (`base`), and the k seeded variants are k codegen'd `min(xxhash64(j,
    * base))` aggregates over the same row — partial (map-side) aggregation
    * reduces the shuffle to one k-column row per doc regardless of corpus
    * size. */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, k: Int = 32): DataFrame = {
    val aggs = (0 until k).map(j => min(xxhash64(lit(j), col("base"))).as(s"mh_$j"))
    docs
      .select(col(idCol), explode(shingles(col(textCol), shingleN)).as("sh"))
      .select(col(idCol), xxhash64(col("sh")).as("base"))
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Docs → (id, band, bucket) LSH table: each band's bucket hashes its
    * signature slice; bands explode from an in-row array (no extra shuffle). */
  def minhashTable(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, k: Int = 32, bands: Int = 8): DataFrame = {
    val width = k / bands
    val sigs = minhashSignatures(docs, textCol, idCol, shingleN, k)
    val bandStructs = (0 until bands).map { b =>
      val slice = (0 until width).map(i => col(s"mh_${b * width + i}"))
      struct(lit(b).as("band"), xxhash64(lit(b) +: slice: _*).as("bucket"))
    }
    sigs
      .select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Candidate pairs from LSH buckets, verified with exact Jaccard over the
    * shingle sets; only pairs ≥ threshold survive. The self-join is
    * restricted to same (band,bucket) groups — the LSH trick that replaces
    * the quadratic cross join at scale — and shingle sets are only joined
    * back in for the (few) surviving candidates.
    *
    * The verify join carries `xxhash64(shingle)` arrays, not the shingle
    * strings: Jaccard over the hashed sets equals Jaccard over the strings
    * up to 2^-64 collisions (xxhash64 is injective in practice on any real
    * shingle universe), and the candidate shuffle moves 8 bytes per shingle
    * instead of the n-gram text.
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
    val sh = docs.select(col(idCol),
      transform(shingles(col(textCol), shingleN), s => xxhash64(s)).as("sh"))
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
