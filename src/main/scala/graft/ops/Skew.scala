package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations (100 TB posture).
  *
  * First line of defense is AQE's skew-join splitting (enabled in
  * `core/Sessions`), which re-plans oversized shuffle partitions at runtime.
  * These helpers cover the cases AQE cannot: broadcast-ineligible dimension
  * joins with a few pathological hot keys, and hot-key groupBys.
  *
  *  - [[saltedJoin]]: the big side gets a random salt in [0, factor); the
  *    small side is replicated `factor`× with every salt value; the join key
  *    becomes (key, salt), spreading each hot key over `factor` partitions.
  *    Correctness is unchanged for equi-joins (each big row still matches
  *    exactly its key's rows, now on one specific replica).
  *  - [[saltedAggregate]]: two-phase hot-key aggregation — partial agg on
  *    (key, salt), final agg on key. Only safe for reassociatable aggregates
  *    (sum/count/min/max), which is why it takes them explicitly.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key` with `factor`-way salting.
    *
    * Only inner/left(_outer)/left_semi are admitted: under right/full outer
    * joins each unmatched small-side key would surface once per salt replica
    * (factor null-padded rows instead of one), silently corrupting results.
    *
    * Same spreading-salt caveats as [[saltedAggregate]]: big-side rows that
    * are FULL duplicates (identical non-key values — common in exactly the
    * skewed data this helper targets) share a salt bucket, so a hot key made
    * of duplicates stays on one reducer and the mitigation silently does
    * nothing; and a big frame whose ONLY column is the join key has no
    * non-key column to hash, so the default salt derivation refuses loudly.
    * Both shapes take an explicit `salt` — but an explicit salt must still
    * be a pure row function (the :37 contract below): a layout-dependent
    * salt (`monotonically_increasing_id`, per-partition `rand`) re-buckets
    * rows on lineage recomputation, and a re-bucketed row can be duplicated
    * or dropped across already-committed reducers even though every bucket
    * would match the same small rows. For the all-duplicates shape the
    * robust fix is upstream: collapse duplicates first
    * (`groupBy(all columns).count`) and join the distinct rows, or carry a
    * stable ingest id (file offset, source row id) into the salt hash.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int,
      joinType: String = "inner", salt: Option[Column] = None): DataFrame = {
    require(factor > 0)
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi").contains(jt),
      s"saltedJoin supports inner/left/left_semi only, got '$joinType' " +
        "(right/full outer would emit one unmatched row per salt replica)")
    // the salt must be a PURE ROW FUNCTION, not per-partition-seeded rand:
    // a lost map output recomputed through lineage (fetch failure, AQE
    // re-plan) would re-draw rand() salts, so a row could land on a replica
    // whose reducer already committed without it — duplicated or dropped
    // join rows. Same derivation contract as [[saltedAggregate]].
    val salted = big.withColumn("__salt",
      salt.getOrElse(spreadingSalt(big, Set(key), factor, "saltedJoin")))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Deterministic spreading salt: `hash(non-key hashable columns) mod
    * factor` — a pure row function (recomputation-stable), hashing only
    * NON-key columns because the group/join keys are constant within the
    * hot key and would collapse every hot row into one bucket. */
  private def spreadingSalt(df: DataFrame, keySet: Set[String], factor: Int,
      fn: String): Column = {
    val hashable = df.schema.fields.collect {
      case f if !keySet.contains(f.name) && isHashable(f.dataType) => col(f.name)
    }.toSeq
    require(hashable.nonEmpty,
      s"$fn: no hashable non-key column to derive a spreading salt from " +
        "(value columns are map-typed or absent); pass an explicit salt column")
    pmod(hash(hashable: _*), lit(factor))
  }

  /** Two-phase aggregation: partial on (keys, salt), final on keys.
    * `partial` aggregates run per salt bucket; `finalAggs` must recombine
    * them (e.g. partial sum -> final sum, partial count -> final sum).
    *
    * The default salt is `hash(hashable columns) mod factor` — a pure row
    * function, so a lost partition recomputed through lineage (or an AQE
    * re-plan, or a `repartition` upstream) assigns every row the same salt
    * again. Layout-dependent salts (`spark_partition_id`,
    * `monotonically_increasing_id`, per-partition-seeded `rand`) break that
    * recomputation story. MapType columns are excluded from the hash (Spark
    * rejects `hash` over maps — unordered entries have no canonical hash);
    * a frame whose EVERY column is map-typed must supply `salt` explicitly.
    *
    * Rows that are full duplicates share a salt bucket, so a hot key whose
    * rows are mostly IDENTICAL stays on one bucket — the degenerate case
    * this helper cannot fix from row content alone. For that shape either
    * pre-aggregate duplicates first (`groupBy(all columns).count` — usually
    * the better tool anyway) or pass an explicit `salt` such as
    * `pmod(hash(col("k"), monotonically_increasing_id()), lit(factor))`,
    * accepting that a mid-job recomputation may re-bucket rows (final
    * results stay correct — the outer agg collapses salt — but partial-agg
    * sizes can differ between attempts). */
  def saltedAggregate(df: DataFrame, keys: Seq[String], factor: Int,
      partial: Seq[Column], finalAggs: Seq[Column],
      salt: Option[Column] = None): DataFrame = {
    require(factor > 0 && partial.nonEmpty && finalAggs.nonEmpty)
    val saltCol = salt.getOrElse(
      spreadingSalt(df, keys.toSet, factor, "saltedAggregate"))
    val salted = df.withColumn("__salt", saltCol)
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Whether `hash()` accepts this type: maps are rejected anywhere in the
    * type tree (`spark.sql.legacy.allowHashOnMapType` defaults false). */
  private def isHashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => isHashable(f.dataType))
      case a: ArrayType => isHashable(a.elementType)
      case _ => true
    }
  }
}
