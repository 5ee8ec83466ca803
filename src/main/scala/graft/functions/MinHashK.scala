package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All k minhash values of a shingle-hash array in ONE pass — `array<long>`
  * of length k, entry j = min over bases of `xxhash64(j, base)` where
  * `base` is the shingle's hash (from [[ShingleHashes]]).
  *
  * Hash composition is BIT-IDENTICAL to the composable form it replaces
  * (`explode` → k× `min(xxhash64(lit(j), base))` grouped aggregates): the
  * same XXH64 fold with the same seed 42 and the same child types (int j
  * folded into the seed, then the long base), asserted by an equivalence
  * test in ExtSpec. Identical values ⇒ identical LSH band buckets ⇒
  * identical candidate pairs downstream.
  *
  * Why a custom Expression (the [[SimHash64]] rationale): the aggregate
  * form needs a docs×shingles explode, a k-aggregate hash aggregation, and
  * a doc-keyed shuffle just to get per-doc minima. Here the signature is
  * computed where the document already is — the whole minhash step is
  * shuffle-FREE scan-stage work, which at 100 TB removes the only shuffle
  * whose row count scales with corpus × shingle count.
  */
case class MinHashK(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && k <= 1024, s"k must be in [1,1024], got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_k requires array<long> (shingle hashes), got $t")
  }

  // xxhash64(lit(j), base) folds the int j into the seed first; that prefix
  // is shingle-independent, so hoist it out of the per-shingle loop
  @transient private lazy val jSeeds: Array[Long] =
    Array.tabulate(k)(j => XXH64.hashInt(j, 42L))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // An EMPTY shingle array would yield k Long.MaxValue sentinels — one
    // shared signature that bands every empty doc as a candidate dup of
    // every other. ShingleHashes never emits empty (short docs fall back
    // to one whole-text shingle), so an empty array here is misuse of the
    // raw SQL surface: loud, like the geometry guards of this family.
    if (n == 0)
      throw new IllegalArgumentException(
        "minhash_k: empty shingle array — build inputs with " +
          "graft_shingle_hashes (its short-doc fallback guarantees >= 1 shingle)")
    val seeds = jSeeds
    val mins = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s < n) {
      // getLong reads a null slot as 0 — a phantom shingle whose k hashes
      // would dominate minima and band unrelated docs together (the
      // PqAdc null-slot contract)
      if (arr.isNullAt(s))
        throw new IllegalArgumentException(
          s"minhash_k: null shingle hash at index $s — hashes must be dense")
      val base = arr.getLong(s)
      var j = 0
      while (j < k) {
        val h = XXH64.hashLong(base, seeds(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashK =
    copy(child = newChild)
}

object MinHashK {
  def apply(shingleHashes: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashK(GraftColumnBridge.expression(shingleHashes), k))
}
