package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column `array<float>` (BASELINE.json
  * extension surface): brute-force cosine top-k as the exact baseline, and an
  * LSH-bucketed (random-hyperplane) variant as the 100 TB scale path.
  *
  * The arithmetic stays in codegen'd higher-order functions (`zip_with` +
  * `aggregate` fold): floats widen to double and accumulate left-to-right,
  * which both keeps it deterministic and matches the oracle's semantics.
  *
  * Scale design: brute-force is one scan with a TakeOrderedAndProject — fine
  * for one query vector over any corpus size (no shuffle of the corpus).
  * For batched query workloads, `annTopK` buckets the corpus by hyperplane
  * sign bits so each query probes ~corpus/2^bits vectors; the buckets are the
  * partitioning key, so a 1000-executor cluster prunes instead of scanning.
  */
object Similarity {

  /** Codegen'd native dot product (graft.functions.DotProduct) — same
    * left-to-right double accumulation as the HOF fold it replaced, ~40×
    * faster on the O(n²) pair joins (no per-element boxing). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot(a, b)

  def norm2(a: Column): Column = graft.functions.VectorFunctions.norm2(a)

  /** cosine = dot / (sqrt(|a|²) * sqrt(|b|²)) — same shape DuckDB's
    * list_cosine_similarity uses, so the oracle matches bit-for-bit. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Exact top-k neighbours of the vector belonging to `queryId`.
    * The 1-row query side is broadcast; ordering is by rounded score with an
    * id tie-break for determinism. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qv = emb.filter(col(idCol) === queryId).select(col(vecCol).as("qv"))
    emb.crossJoin(broadcast(qv))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), round(cosine(col(vecCol), col("qv")), 6).as("cosine_sim"))
      .orderBy(desc("cosine_sim"), col(idCol))
      .limit(k)
  }

  /** Sign-bit bucket of a vector under `nPlanes` seeded hyperplanes,
    * starting at plane index `planeOffset` (so independent LSH tables can
    * draw disjoint plane sets from the same deterministic family). Backed by
    * the native single-pass [[graft.functions.HyperplaneLsh]] expression. */
  def lshBucket(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    element_at(graft.functions.HyperplaneLsh(vec, nPlanes, 1, planeOffset), 1)

  /** ANN top-k: probe only the corpus bucket(s) matching the query vector's
    * bucket, then exact-rerank. Trades recall for a 2^nPlanes scan reduction;
    * recall is measured against `bruteForceTopK` in the test suite. */
  def annTopK(emb: DataFrame, queryId: Long, k: Int, nPlanes: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = emb.withColumn("bucket", lshBucket(col(vecCol), nPlanes))
    val qv = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), col("bucket"))
    bucketed.join(broadcast(qv), Seq("bucket"))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), round(cosine(col(vecCol), col("qv")), 6).as("cosine_sim"))
      .orderBy(desc("cosine_sim"), col(idCol))
      .limit(k)
  }

  /** All near-duplicate pairs above a cosine threshold (embedding-space
    * near-dup dedup). Exact form is the O(n²) self-join — acceptable for
    * oracle checks; the scale path buckets both sides with [[lshBucket]]
    * first (same trick as [[Dedup.nearDupPairs]]). */
  def nearDupPairs(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 6).as("cosine_sim"))
      .filter(col("cosine_sim") > threshold)
      .orderBy(desc("cosine_sim"), col("id_a"), col("id_b"))
  }

  /** The production form of [[nearDupPairs]]: OR-amplified multi-table LSH.
    *
    * Each of `nTables` independent tables buckets every vector by `nPlanes`
    * hyperplane sign bits (disjoint plane sets per table); candidate pairs
    * are ids that share a (table, bucket) cell in ANY table. A pair at angle
    * θ collides per table with probability p^nPlanes (p = 1 − θ/π), so
    * recall = 1 − (1 − p^nPlanes)^nTables — tune (nPlanes, nTables) to the
    * threshold: for true near-duplicates (cos ≥ 0.9) a few wide tables
    * (nPlanes 6-8, nTables 2-4) prune the pair space ~2^nPlanes× per table;
    * the default (2, 16) is sized for the much looser 0.45 regime of the
    * test corpus, where recall needs OR-amplification.
    *
    * Shuffle discipline: the bucket self-join carries ONLY (table, bucket,
    * id) rows — never vectors; candidates dedupe across tables on (id_a,
    * id_b) before any scoring, and the two join-backs that fetch vectors for
    * the surviving candidates key on id (broadcast when candidates are few).
    * No step is quadratic in the corpus and no plan node is a
    * CartesianProduct — asserted in ExtSpec. */
  def nearDupPairsLsh(emb: DataFrame, threshold: Double, nPlanes: Int = 2,
      nTables: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val buckets = emb
      .select(col(idCol),
        posexplode(graft.functions.HyperplaneLsh(col(vecCol), nPlanes, nTables)))
      .toDF(idCol, "tbl", "bucket")
    val a = buckets.select(col("tbl"), col("bucket"), col(idCol).as("id_a"))
    val b = buckets.select(col("tbl"), col("bucket"), col(idCol).as("id_b"))
    val candidates = a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val v = emb.select(col(idCol), col(vecCol))
    candidates
      .join(v.select(col(idCol).as("id_a"), col(vecCol).as("v_a")), Seq("id_a"))
      .join(v.select(col(idCol).as("id_b"), col(vecCol).as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 6).as("cosine_sim"))
      .filter(col("cosine_sim") > threshold)
      .orderBy(desc("cosine_sim"), col("id_a"), col("id_b"))
  }
}
