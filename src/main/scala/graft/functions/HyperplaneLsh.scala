package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, Murmur3HashFunction, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Sign-bit LSH buckets of a numeric vector under seeded random hyperplanes,
  * for ALL of `nTables` OR-amplification tables in ONE pass — returns
  * `array<long>` of length `nTables`, where entry t packs the sign bits of
  * planes `[offset + t*nPlanes, offset + (t+1)*nPlanes)` (first plane =
  * most significant bit).
  *
  * Why a custom Expression (same rationale as [[DotProduct]]): the
  * composable form — `transform(sequence(...), p => aggregate(zip_with(
  * vec, sequence(...), ...)))` per table — is interpreted HOF machinery
  * that re-walks the vector with per-element boxing once per plane per
  * table; this expression is a tight primitive loop. CodegenFallback is
  * fine: the per-row work is one Scala loop, not an expression tree.
  *
  * Plane components are `murmur3(plane, dim)` (the same Murmur3 as Spark's
  * `hash()`, seed 42, both operands hashed as longs) mapped into
  * [-0.5, 0.5). Murmur3's avalanche makes distinct planes statistically
  * independent — a property multi-table OR-amplification recall depends on.
  * No RNG state: buckets are reproducible on any cluster, any partitioning.
  */
case class HyperplaneLsh(child: Expression, nPlanes: Int, nTables: Int, planeOffset: Int)
    extends UnaryExpression with CodegenFallback {

  require(nPlanes >= 1 && nPlanes <= 63, s"nPlanes must be in [1,63], got $nPlanes")
  require(nTables >= 1, s"nTables must be >= 1, got $nTables")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_lsh requires array<float|double>, got $t")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def component(plane: Long, dim: Long): Double =
    HyperplaneLsh.component(plane, dim)

  /** Plane components memoized per expression instance: hashing is a pure
    * function of (plane, dim), so recomputing two Murmur3 rounds per
    * component per ROW (nPlanes·nTables·dim·2 hash calls each) would
    * dominate the scan. Built lazily at the first row's dimensionality and
    * rebuilt only if a wider vector appears; rows are indexed with the
    * matrix's own stride so a concurrent rebuild (benign race — every build
    * writes identical values) can never misalign a reader. */
  @transient private var planeCache: Array[Double] = _

  private def planeMatrix(dims: Int): Array[Double] = {
    val rows = nPlanes * nTables
    var c = planeCache
    if (c == null || c.length < rows * dims) {
      c = new Array[Double](rows * dims)
      var r = 0
      while (r < rows) {
        var i = 0
        while (i < dims) {
          c(r * dims + i) = component((planeOffset + r).toLong, i.toLong)
          i += 1
        }
        r += 1
      }
      planeCache = c
    }
    c
  }

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    // null components would project as 0.0 — sign bits near the margin
    // flip vs the true vector and the row lands in a wrong-but-valid
    // bucket, silently unfindable by every probe (the PqAdc null-slot
    // contract); validate once before any projection
    var j = 0
    while (j < n) {
      if (vec.isNullAt(j))
        throw new IllegalArgumentException(
          s"hyperplane_lsh: null element at index $j — vectors must be dense")
      j += 1
    }
    val mat = planeMatrix(n)
    val stride = mat.length / (nPlanes * nTables)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val base = (t * nPlanes + p) * stride
        var proj = 0.0
        var i = 0
        while (i < n) {
          val v = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          proj += v * mat(base + i)
          i += 1
        }
        bucket = (bucket << 1) | (if (proj >= 0) 1L else 0L)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLsh =
    copy(child = newChild)
}

object HyperplaneLsh {
  def apply(vec: Column, nPlanes: Int, nTables: Int, planeOffset: Int = 0): Column =
    GraftColumnBridge.column(
      HyperplaneLsh(GraftColumnBridge.expression(vec), nPlanes, nTables, planeOffset))

  /** The deterministic plane family, shared verbatim by the expression and
    * by driver-side callers (multi-probe bucket derivation needs per-plane
    * projections of ONE query vector — no reason to launch a job for it). */
  private[graft] def component(plane: Long, dim: Long): Double = {
    val h1 = Murmur3HashFunction.hash(plane, LongType, 42L)
    val h2 = Murmur3HashFunction.hash(dim, LongType, h1)
    h2.toInt.toDouble / 4294967296.0
  }

  /** Driver-side per-plane projections of `vec` under planes
    * `[planeOffset, planeOffset + nPlanes)` — the same values the
    * expression folds into sign bits (first plane = most significant). */
  def projections(vec: Array[Double], nPlanes: Int, planeOffset: Int = 0): Array[Double] = {
    val out = new Array[Double](nPlanes)
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      var i = 0
      while (i < vec.length) {
        proj += vec(i) * component((planeOffset + p).toLong, i.toLong)
        i += 1
      }
      out(p) = proj
      p += 1
    }
    out
  }

  /** Pack projections into the expression's bucket id (sign bits, first
    * plane most significant). */
  def bucketOf(projections: Array[Double]): Long =
    projections.foldLeft(0L)((b, proj) => (b << 1) | (if (proj >= 0) 1L else 0L))
}
